"""Record linkage: blocked fuzzy matching by edit distance.

The reference joins entities only on exact keys (e.g. the player/team
equi-joins at ``aws-job-bronze-to-silver/aws-job-bronze-to-silver.py:
110-114``); real entity resolution also needs NEAR matches ("same name up
to a typo"). The naive plan is an all-pairs ``levenshtein`` theta-join —
O(n²) and a cartesian product, unusable at scale.

This module implements the FastSS / deletion-neighborhood scheme
(Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007):

- Every string emits its *deletion neighborhood* — itself plus each
  single-character-deletion variant (L+1 signatures for length L).
- If ``lev(a, b) <= 1`` then the neighborhoods intersect (substitution:
  delete the edited position from both; insert/delete: the shorter string
  IS a variant of the longer). The converse has false positives (e.g.
  "ab"/"ba" share variants at distance 2), so candidates are verified
  with an exact ``levenshtein`` filter.
- Signatures are hashed to 64-bit (``xxhash64``) so the shuffle carries
  narrow integer keys; hash-collision candidates are killed by the same
  verify step.

Scale shape: signature fan-out is linear (L+1 rows per string), the
self-join is an equi-join on the hash (no theta/cartesian), and block
sizes are bounded by how many strings actually collide on a variant —
unlike prefix- or segment-blocking, a shared boilerplate prefix does NOT
create a hot block, because a signature pins the ENTIRE string minus one
character. Identical duplicate texts do form quadratic blocks; route
exact duplicates through ``operators/dedup.exact`` first (pairs inside an
identical-text group are trivially distance 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) → one row per deletion-neighborhood signature:
    (sig, id, text). Signature 0 is the string itself; signature j>0 is
    the string with character j removed. Emitted via a JVM-side transform
    over ``sequence(0, L)`` — no Python in the fan-out."""
    c = f"`{text_col}`"  # backtick-quoted: survives 3p/+//fg%-style names
    sigs = df.select(
        F.col(id_col),
        F.col(text_col),
        # array_distinct: a run of k identical characters yields k identical
        # deletion variants; without the dedup a matching pair is joined
        # k_a × k_b times through that variant (runs of zeros in padded
        # numeric IDs make this quadratic-ish in run length).
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, length({c})), "
                    f"j -> CASE WHEN j = 0 THEN {c} "
                    f"     ELSE concat(substring({c}, 1, j - 1), "
                    f"                 substring({c}, j + 1, length({c}))) END)"
                )
            )
        ).alias("_variant"),
    )
    return sigs.select(
        F.xxhash64("_variant").alias("_sig"), F.col(id_col), F.col(text_col)
    )


def fuzzy_pairs_fastss(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) whose texts are within edit
    distance 1, without an all-pairs join: deletion-neighborhood blocking
    → distinct candidate pairs → exact ``levenshtein`` verify. Returns
    (``{id}_a``, ``{id}_b``, ``dist``).

    The candidate self-join is a plain equi-join on the 64-bit signature
    hash; every true pair is produced (neighborhood-intersection
    guarantee), every false positive (shared variant at distance 2, or a
    hash collision) is removed by the verify filter. NULL texts are
    dropped up front: they all hash to the same NULL signature, which
    would form one quadratic hot block the verify step then discards
    pair-by-pair (and NULL has no meaningful edit distance anyway)."""
    clean = df.filter(F.col(text_col).isNotNull())
    sigs = _deletion_signatures(clean, id_col, text_col)
    # FULLY NARROW pipeline (r6 rework, measured 2.77 → 1.65 s min-of-3 at
    # sf0.1, identical 262,500-row result): the signature self-join and
    # the candidate-pair distinct carry ONLY (sig, id) / (id_a, id_b)
    # integers — the r5 form shuffled each text L+1 times through the
    # signature join (O(L²) characters per string) and re-ran the
    # levenshtein verify once per shared signature (≈2-3×). Texts now
    # re-enter via two plain equi-joins on the id (each text shuffled
    # ONCE), and the THRESHOLD-BOUNDED levenshtein (3-arg form, O(L·t)
    # banded, r5: 4.33 → 2.62 s) runs exactly once per distinct candidate
    # pair. Two extra narrow exchanges, strictly less data moved and less
    # compute — the trade that wins harder the longer the strings get.
    a = sigs.select("_sig", F.col(id_col).alias("_id_a"))
    b = sigs.select("_sig", F.col(id_col).alias("_id_b"))
    cand = (
        a.join(b, "_sig")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .select("_id_a", "_id_b")
        .distinct()
    )
    ta = clean.select(
        F.col(id_col).alias("_id_a"), F.col(text_col).alias("_text_a")
    )
    tb = clean.select(
        F.col(id_col).alias("_id_b"), F.col(text_col).alias("_text_b")
    )
    return (
        cand.join(ta, "_id_a")
        .join(tb, "_id_b")
        .select(
            F.col("_id_a").alias(f"{id_col}_a"),
            F.col("_id_b").alias(f"{id_col}_b"),
            F.levenshtein("_text_a", "_text_b", 1).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )
