"""HyperBall — HLL ball sketches for centrality at 100 TB (Boldi &
Vigna 2013, "In-Core Computation of Geometric Centralities with
HyperBall: A Hundred Billion Nodes and Beyond" — public).

``graph.harmonic_centrality_micro`` is exact but carries the reached-
PAIR table — fine for bounded-radius/medium graphs, quadratic-ish on a
web graph. HyperBall replaces the pair table with one fixed-size
HyperLogLog counter per node: ball_t(v) (the set of nodes that reach v
within t hops) becomes m registers, and the update

    ball_t(v) = ball_{t-1}(v)  ∪  ⋃_{u → v}  ball_{t-1}(u)

becomes an elementwise register MAX — associative, commutative,
IDEMPOTENT, so the result is layout-independent BY ALGEBRA (the r10
partitions-audit lesson applied at design time: a max-merge cannot see
partition order). Per round that is ONE edges⋈counters equi-join plus
ONE groupBy(dst) with m flat ``max`` aggregates — map-side combined,
whole-stage codegen'd, no arrays, no HOFs in the hot path, state
O(nodes · m) however deep the graph.

Determinism contract (cross-engine twin-able):

- The per-node hash is a 32-bit avalanche mixer written as plain
  integer arithmetic (shift-as-floor-division / xor / multiply-mod-2³²;
  every intermediate < 2⁵⁸, no int64 overflow, no ANSI traps). The
  SAME recipe renders into each engine's dialect
  (:func:`mixer_sql` — Spark spells integer division ``div`` and xor
  ``^``, DuckDB spells them ``//`` and ``xor()``); no engine hash
  builtin is involved, so the registers are an engine-free function of
  the node ids.
- register index = h mod m, rho = leading-zero rank of the remaining
  27 bits + 1 via a generated CASE ladder (pure comparisons).
- After t rounds, register (v, j) EQUALS max rho over the EXACT ball —
  so a DuckDB twin that unrolls t BFS rounds (the harmonic oracle's
  machinery) and takes the same max reproduces every register
  BIT-EXACTLY. The ball-size estimate is then a fixed closed-form
  expression of integer registers (Σ 2^(K−reg) kept as an exact long;
  one double division per node per round), identical in both engines.

Driver queries (registered r11): ``graph_hyperball_registers`` and
``graph_hyperball_harmonic_est`` carry FULL value oracles (registers and
the corrected estimate both bit-exact vs BFS-derived twins), and
``graph_hyperball_error_certificate`` pins the estimate against the
exact harmonic operator as integer-ppm aggregates;
tests/test_staged_oracles.py keeps the register-level twin and
tests/test_hyperball.py the accuracy certificate plus the
layout-invariance law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.util import ensure_parallelism

#: Register count (2^5). Standard HLL relative error ~1.04/sqrt(m) ≈ 18%;
#: raise to 2^10+ on a real crawl — the plan shape is m flat columns, so
#: the knob only widens one projection.
M_REGISTERS = 32
#: Scale for the exact Σ 2^(K−reg) long: reg ≤ 28 < K keeps each term a
#: positive power of two and the per-node sum < m·2^K ≪ int64.
_K = 40


def alpha_for_m(m: int) -> float:
    """Standard HLL bias-correction constant alpha_m (Flajolet et al.
    2007, Fig. 3): tabulated for the small register counts, the closed
    form 0.7213/(1 + 1.079/m) from m = 128 up. Deriving it here (rather
    than hard-coding the m=32 value) keeps every estimate unbiased when
    callers raise m — the docstrings advise exactly that for real
    dashboards, and a silently-wrong alpha biases ~2-3% at m=64 and
    grows with m (r10 ADVICE finding)."""
    if m < 16:
        raise ValueError(f"alpha_for_m: m={m} below the HLL minimum (16)")
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


_ALPHA_32 = alpha_for_m(32)  # kept for existing importers (m = 32 default)


def _xor(a: str, b: str, dialect: str) -> str:
    return f"({a} ^ {b})" if dialect == "spark" else f"xor({a}, {b})"


def _idiv(a: str, b: int, dialect: str) -> str:
    return f"({a} div {b})" if dialect == "spark" else f"({a} // {b})"


def mixer_sql(col: str, dialect: str) -> str:
    """32-bit avalanche hash (lowbias32 family) as dialect-rendered SQL:
    every intermediate fits int64, every op is plain arithmetic. Input
    must be a non-negative integer expression."""
    h0 = f"({col} % 4294967296)"
    h1 = f"(({_xor(h0, _idiv(h0, 65536, dialect), dialect)} * 73244475) % 4294967296)"
    h2 = f"(({_xor(h1, _idiv(h1, 65536, dialect), dialect)} * 73244475) % 4294967296)"
    return _xor(h2, _idiv(h2, 65536, dialect), dialect)


def rho_sql(w: str) -> str:
    """Leading-zero rank + 1 of a 27-bit value as a CASE ladder (28 for
    w = 0 — the all-zeros remainder). Dialect-free (comparisons only)."""
    branches = " ".join(
        f"WHEN {w} >= {1 << (26 - z)} THEN {z + 1}" for z in range(27)
    )
    return f"(CASE {branches} ELSE 28 END)"


def seed_register_sql(
    col: str, j: int, dialect: str, m: int = M_REGISTERS
) -> str:
    """Register j of the singleton ball {col}: rho if the node lands in
    bucket j, else 0. The same recipe feeds the Spark seeding projection
    and the DuckDB twin."""
    h = mixer_sql(col, dialect)
    return (
        f"(CASE WHEN ({h} % {m}) = {j} THEN "
        f"{rho_sql(_idiv(h, m, dialect))} ELSE 0 END)"
    )


#: Lineage-truncation cadence for the max-merge loop. Values are
#: bit-identical at ANY cadence (the recurrence is), so this is purely a
#: cost knob — and unlike pagerank_micro (narrow 2-col state, where the
#: per-checkpoint job overhead dominated and cadence 3 won 1.76×), the
#: hyperball state is m flat register columns whose round-over-round
#: plans are ~m× wider: with no truncation the EAGER PER-OP ANALYSIS of
#: the growing lineage dominates the wall clock (measured r15, m=64
#: n_rounds=3 at sf0.1: build/analysis 5.2 s vs 1.6 s execution;
#: cadence 1 vs 3 min-of-4 A/B: 6.5 vs 8.2 s at m=64, 3.4 vs 4.3 s at
#: m=32). Cadence 1 = truncate after every non-final round.
_CHECKPOINT_EVERY = 1


def _edges_with_selfloops(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct directed edges UNION one self-loop per node, checkpointed
    once. The self-loops fold the old ``greatest(prev, inflow)`` merge
    join INTO the round's single join+agg:

        ball_t(v) = max over u in N_in(v) ∪ {v} of ball_{t-1}(u)

    so the state frame appears exactly ONCE per round (linear lineage —
    no per-round eager checkpoint needed, cadence only) and the
    left-join + coalesce merge disappears from the plan entirely. Every
    node carries a self-loop, so no node can drop out of the state."""
    e = (
        ensure_parallelism(
            edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    return e.union(
        nodes.select(F.col("node").alias("_s"), F.col("node").alias("_d"))
    ).localCheckpoint(eager=True)


def _seed_balls(e2: DataFrame, m: int) -> DataFrame:
    """Round-0 register state, derived from the self-loop rows (one per
    node — the node set was already computed building ``e2``, so no
    second union+distinct pass).

    STAGED seeding: mixer once per row, then bucket/rho once, then m
    trivial comparisons. Rendering the full mixer + 27-branch rho
    ladder inside every register column (the first cut, mirroring
    seed_register_sql) built a ~1000-node projection whose whole-stage
    codegen compile alone cost ~8 s (r10 profile receipt, PERF.md);
    CollapseProject keeps these stages separate because the aliases
    are non-cheap and multiply referenced (the with_shingles rule)."""
    regs = [f"_r{j}" for j in range(m)]
    nodes = e2.filter(F.col("_s") == F.col("_d")).select(
        F.col("_s").alias("node")
    )
    return (
        nodes.withColumn("_h", F.expr(mixer_sql("node", "spark")))
        .withColumn("_b", F.col("_h") % m)
        .withColumn("_rho", F.expr(rho_sql(_idiv("_h", m, "spark"))))
        .selectExpr(
            "node",
            *[
                # string projection (r16): same CASE per register, built
                # as one parsed string instead of m when/otherwise/cast
                # Column chains — m× fewer driver round-trips per build
                f"CAST(CASE WHEN _b = {j} THEN _rho ELSE 0 END AS INT) AS {r}"
                for j, r in enumerate(regs)
            ],
        )
    )


def _round_agg(
    e2: DataFrame, balls: DataFrame, regs: list[str], carry: list[str]
) -> DataFrame:
    """One max-merge round: ball_t(v) = max over u in N_in(v) ∪ {v} —
    ONE equi-join + m flat MAX aggregates (map-side combined). Idempotent
    max-merge => extra rounds past the diameter are no-ops, and no layout
    can change a single register. ``carry`` columns are per-node scalars
    threaded through the aggregation via the self-loop row (exactly one
    row per group has ``_s == _d``, so ``max(when(_s == _d, c))`` is that
    node's own value, untouched)."""
    joined = e2.join(balls, e2["_s"] == balls["node"])
    return joined.groupBy(F.col("_d").alias("node")).agg(
        *[F.max(r).alias(r) for r in regs],
        *[
            F.max(F.when(F.col("_s") == F.col("_d"), F.col(c))).alias(c)
            for c in carry
        ],
    )


def hyperball_registers(
    edges: DataFrame,
    n_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    m: int = M_REGISTERS,
) -> DataFrame:
    """Register state after ``n_rounds`` max-merge rounds: one row per
    (node, j, reg) with reg = max rho over the EXACT ≤ n_rounds in-ball
    (bit-exact vs an unrolled-BFS twin). Nodes must be non-negative
    integers (hash-mix contract)."""
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    regs = [f"_r{j}" for j in range(m)]
    e2 = _edges_with_selfloops(edges, src, dst)
    balls = _seed_balls(e2, m)
    for t in range(1, n_rounds + 1):
        balls = _round_agg(e2, balls, regs, [])
        if t % _CHECKPOINT_EVERY == 0 and t < n_rounds:
            balls = balls.localCheckpoint(eager=True)
    # posexplode of the register array: position IS the register index,
    # so the old array-of-(j, reg)-structs build (m struct Columns) is
    # just posexplode(array(regs…)) — same (node, j, reg) rows/types
    return balls.selectExpr(
        "node",
        "posexplode(array(" + ",".join(regs) + ")) AS (j, reg)",
    )


def linear_counting_case_sql(v: str, m: int) -> str:
    """Small-range (linear counting) table as literal doubles: E =
    m · ln(m / V) for V zero registers. The values are generated ONCE in
    Python and embedded as full-precision literals, so Spark and DuckDB
    parse the SAME decimal into the same double — no engine ln()
    divergence can enter (dialect-free fragment)."""
    import math

    branches = " ".join(
        f"WHEN {v} = {vv} THEN CAST({m * math.log(m / vv)!r} AS DOUBLE)"
        for vv in range(1, m + 1)
    )
    return f"(CASE {branches} ELSE 0.0 END)"


def _raw_v_exprs(m: int, regs: list[str]) -> tuple[str, str]:
    """HLL estimate ingredients over flat register columns as TWO SMALL
    SQL strings: raw E = alpha_m · m² / Σ 2^(−reg) with the denominator
    carried as the EXACT long Σ 2^(K−reg) (reg ≤ 28 < K, one double
    division total), and V = the zero-register count. Both sums fold an
    ``array(regs…)`` with a higher-order ``aggregate`` instead of an
    m-term column tree: integer sums are order-insensitive, so the
    values are bit-identical to the old per-column chain (pinned by the
    driver oracles), while the expression tree shrinks from O(m²) nodes
    across the projection to O(m) — the r16 receipt: per-round plan
    construction+analysis 1.14 → 0.07 s at m = 64, which dominated the
    whole HyperBall family's wall clock (execution on the ≤101-node
    graph is ~0.4 s; building the plans was 5+ s). The raw quotient
    keeps the same fixed IEEE order (alpha·m² times 2^K, divided by the
    exact long sum) via D-suffixed double literals that round-trip
    exactly."""
    arr = "array(" + ",".join(regs) + ")"
    s_expr = (
        f"aggregate({arr}, CAST(0 AS BIGINT), "
        f"(a, r) -> a + CAST(POW(2, {_K} - r) AS BIGINT))"
    )
    v_expr = f"aggregate({arr}, 0, (a, r) -> a + CASE WHEN r = 0 THEN 1 ELSE 0 END)"
    raw = (
        f"({alpha_for_m(m) * m * m!r}D * {float(2**_K)!r}D"
        f" / CAST({s_expr} AS DOUBLE))"
    )
    return raw, v_expr


def _corrected_sql(m: int, raw_col: str, v_col: str) -> str:
    """The standard HLL small-range switch as SQL: linear counting
    E = m · ln(m / V) when raw E ≤ 2.5 m and V > 0 zero registers exist —
    without it the raw estimator reads an EMPTY ball as alpha·m ≈ 22,
    drowning the small balls truncated-harmonic sums are made of."""
    return (
        f"CASE WHEN {raw_col} <= {2.5 * m!r}D AND {v_col} > 0 THEN "
        + linear_counting_case_sql(v_col, m)
        + f" ELSE {raw_col} END"
    )


def hyperball_harmonic_estimate(
    edges: DataFrame,
    n_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    m: int = M_REGISTERS,
) -> DataFrame:
    """Approximate truncated harmonic centrality from ONE HyperBall run:
    H(v) ≈ Σ_t (E_t(v) − E_{t−1}(v)) / t over the per-round ball-size
    estimates. Output (node, harmonic_micro_est) as half-up micro-units
    (floor(x·10⁶ + 0.5)) — a fixed-order double pipeline over integer
    registers, layout-free because the registers are. Each per-round
    ball size uses the CORRECTED estimator (:func:`_corrected`: linear
    counting E = m·ln(m/V) when raw E ≤ 2.5m and V > 0) — the raw form
    reads an EMPTY ball as alpha·m ≈ 22, drowning the small balls a
    truncated harmonic sum is made of; the correction's literal-embedded
    CASE table keeps the expression engine-portable. At m = 32 typical
    relative error is ~18% — test_hyperball pins the certificate against
    the exact operator.

    The per-round estimates accumulate INSIDE the iterating state frame
    (``_e`` = this round's corrected estimate, ``_hsum`` = the running
    delta sum, both threaded through each round's aggregation via the
    self-loop row), so the old n_rounds-way join of per-round state
    frames disappears: the delta sum is built with the SAME operand
    order (t = 1..n, left-associated), so every double — and the final
    micro value — is unchanged."""
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    regs = [f"_r{j}" for j in range(m)]
    e2 = _edges_with_selfloops(edges, src, dst)
    raw, v = _raw_v_exprs(m, regs)
    corr = _corrected_sql(m, "_raw", "_v")

    # Two selectExpr projections per round (r16): stage _raw/_v (the
    # with_shingles rule — each is referenced by the corrected CASE),
    # then emit _e and the updated _hsum in ONE projection. The
    # corrected CASE appears twice there (once as _e, once inside the
    # delta) — a deterministic expression over the SAME staged _raw/_v,
    # so the doubles are identical wherever it's evaluated; the old
    # three-projection chain existed only to single-evaluate it, and at
    # ≤101 rows per round the duplicate CASE costs nothing while the
    # extra eagerly-analyzed Dataset per round cost real driver time.
    balls = (
        _seed_balls(e2, m)
        .selectExpr("node", *regs, f"{raw} AS _raw", f"{v} AS _v")
        .selectExpr("node", *regs, f"{corr} AS _e", "0.0D AS _hsum")
    )
    for t in range(1, n_rounds + 1):
        staged = _round_agg(e2, balls, regs, ["_e", "_hsum"]).selectExpr(
            "node", *regs, f"{raw} AS _raw", f"{v} AS _v",
            "_e AS _eprev", "_hsum",
        )
        # per-round delta clamped at 0: the linear/raw estimator switch
        # can dip a hair across rounds even though registers only grow
        balls = staged.selectExpr(
            "node",
            *regs,
            f"{corr} AS _e",
            f"(_hsum + greatest(({corr}) - _eprev, 0.0D)"
            f" / {float(t)!r}D) AS _hsum",
        )
        if t % _CHECKPOINT_EVERY == 0 and t < n_rounds:
            balls = balls.localCheckpoint(eager=True)
    return balls.selectExpr(
        "node",
        "CAST(floor(_hsum * 1000000.0D + 0.5D) AS BIGINT)"
        " AS harmonic_micro_est",
    )
