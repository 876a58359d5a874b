from datalake_nba_dmc_spark.sources.registry import TABLES, TableRegistry, load_table

__all__ = ["TABLES", "TableRegistry", "load_table"]
