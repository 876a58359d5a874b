"""Pipeline plans — declarative multi-job dataflows (medallion runner)."""
