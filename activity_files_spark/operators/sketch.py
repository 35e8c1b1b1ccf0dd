"""HyperLogLog distinct sketch as PURE relational integer arithmetic —
the approximate COUNT(DISTINCT) a 10^12-row corpus needs (exact distinct
is a full shuffle of every distinct key; the sketch ships 256 small
integers per group).

Everything is expressible in both engines with IDENTICAL operations, so
the DuckDB oracle replays the sketch bit-for-bit — including the float
estimate, because every float enters through one deterministic division
of identical integer operands:

- **Hash**: three rounds of multiply-accumulate mixing modulo the
  Mersenne prime M = 2^61 - 1, interleaved with xor-shifts. Each multiply
  splits its operand into 31-bit halves so no intermediate exceeds 2^63
  (Spark runs ANSI mode; silent wraparound is not available and not
  wanted). Ids must be non-negative and < 2^62.
- **Rank**: leading-zero count of the 53-bit suffix via the classic
  bit-smear + ``bit_count`` (both engines have native ``bit_count``);
  empty registers unify at rank 0 with no special case.
- **Registers**: per-(group, bucket) MAX of rank — a map-side-combined
  aggregation, the cheapest shuffle shape there is.
- **Register sum**: Σ 2^(54 - max_rank) over all 256 registers as ONE
  BIGINT (max 256·2^54 = 2^62 < 2^63) — the indicator sum scaled by
  2^54, so the hash-sensitive part of the estimator is gate-able as an
  exact integer before any float appears.
- **Estimate**: alpha_m · m² · 2^54 / register_sum, with the standard
  linear-counting correction below 2.5·m (ln on identical operands; both
  engines bind the same machine libm). Standard error 1.04/√m ≈ 6.5 % at
  m = 256.

At 100 TB: the per-row hash is whole-stage-codegen'd JVM arithmetic, the
only shuffle carries (group, bucket, partial-max) rows — bounded at
256·|groups| regardless of row count — and sketches MERGE (max of maxes),
so per-partition partials combine associatively exactly like a built-in
aggregate. HyperLogLog: Flajolet, Fusy, Gandouet, Meunier (2007); the
practical corrections follow Heule, Nunkesser, Hall (2013) in the
linear-counting regime only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = (1 << 61) - 1  # Mersenne prime 2^61-1
_H = 1 << 31  # 31-bit split for overflow-safe multiply
# Multipliers sized so every lo*mul (lo < 2^31) and hi*mul (hi < 2^30)
# stays under 2^63 (ANSI-safe) while the modular product still spans the
# full 61 bits of M — undersized constants would leave the high bits
# zero and inflate every HLL rank. _A/_C are Knuth's 2654435761 and
# xxhash's PRIME2; _B/_D keep the hi-half contribution full-width too.
_A, _B = 2654435761, 40503
_C, _D = 2246822519, 3266489917
_E, _F = 2654435761, 2654435789
_SHIFTS = (30, 27, 31)  # splitmix-style xor-shift amounts, one per round
_P = 8  # 2^8 = 256 registers
_M_REG = 1 << _P
_MAX_RANK = 54  # 53-bit suffix -> ranks 1..54; empty register = 0
_ALPHA = 0.7213 / (1.0 + 1.079 / _M_REG)
# the whole estimator numerator as ONE python-computed double literal, so
# both engines see a single identical constant (no cross-engine arithmetic)
_EST_NUM = _ALPHA * _M_REG * _M_REG * float(1 << _MAX_RANK)


_ROUNDS = ((_A, _B), (_C, _D), (_E, _F))


def _mix_sql(x: str) -> str:
    """Composed textually step-by-step so parenthesization is correct by
    construction (the repeated subexpressions are verbose but DuckDB
    common-subexpression-eliminates them)."""
    h = f"({x})"
    for (mul_lo, mul_hi), sh in zip(_ROUNDS, _SHIFTS):
        m = f"((({h}) % {_H}) * {mul_lo} + (({h}) // {_H}) * {mul_hi}) % {_M}"
        h = f"xor(({m}), (({m}) >> {sh}))"
    return h


def mix_chain(df: DataFrame, keep: list[str], id_col: str, out: str) -> DataFrame:
    """Append the 61-bit mix hash of ``id_col`` as column ``out``, with
    each round its own Project whose output is a NAMED column referenced
    several times — CollapseProject keeps the rounds separate, so no
    whole-stage-codegen method inlines the fully-expanded hash tree (one
    fused tree blows past the method-split limit and trips a Janino
    nested-class IllegalAccessError inside partial hash aggregates).

    PRECONDITION (ADVICE r5): ``id_col`` must be non-negative and < 2^62.
    A negative id diverges silently between the engines — Spark's
    ``bitwiseAND`` masks it non-negative while DuckDB's ``%`` keeps the
    dividend's sign — breaking every sketch/sampling hash gate built on
    this chain. Every current call site feeds generated non-negative ids
    (event_id/doc_id/customer keys); a future negative-keyed table must
    shift or hash its ids into range first."""
    cur = df.select(*keep, F.col(id_col).cast("long").alias("_h"))
    for (mul_lo, mul_hi), sh in zip(_ROUNDS, _SHIFTS):
        m = (
            F.col("_h").bitwiseAND(F.lit(_H - 1)) * mul_lo
            + F.shiftrightunsigned("_h", 31) * mul_hi
        ) % _M
        cur = cur.select(*keep, m.alias("_m")).select(
            *keep,
            F.col("_m").bitwiseXOR(F.shiftrightunsigned("_m", sh)).alias("_h"),
        )
    return cur.withColumnRenamed("_h", out)


def _smear_rank_col(v: Column) -> Column:
    """rank = 54 - floor_log2(v) - 1 ... unified: 54 - popcount(smear(v)).

    smear(v) sets every bit at or below the highest set bit, so
    popcount(smear(v)) = floor_log2(v) + 1 (and 0 for v = 0, which maps
    empty/minimal suffixes to the max rank 54 exactly as HLL requires —
    a suffix of all zeros means 53 leading zero bits were observed)."""
    s = v
    for sh in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftrightunsigned(s, sh))
    return F.lit(_MAX_RANK) - F.bit_count(s)


def _smear_rank_sql(v: str) -> str:
    s = f"({v})"
    for sh in (1, 2, 4, 8, 16, 32):
        s = f"({s} | ({s} >> {sh}))"
    return f"({_MAX_RANK} - bit_count({s}))"


def hll_distinct(
    df: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``id_col`` (non-negative
    BIGINT ids). Returns one row per group: ``n_rows``, ``n_buckets_hit``,
    ``reg_sum`` (the exact-integer register sum — the hash gate) and
    ``hll_est`` (DOUBLE, corrected estimate)."""
    cur = mix_chain(df, list(group_cols), id_col, "_h")
    ranked = cur.select(
        *group_cols,
        F.col("_h").bitwiseAND(F.lit(_M_REG - 1)).alias("_bucket"),
        _smear_rank_col(F.shiftrightunsigned("_h", _P)).alias("_rank"),
    )
    regs = ranked.groupBy(*group_cols, "_bucket").agg(
        F.max("_rank").alias("_max_rank"), F.count("*").alias("_n")
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.sum("_n").alias("n_rows"),
        F.count("*").alias("n_buckets_hit"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_MAX_RANK} - _max_rank)"))
            + (F.lit(_M_REG) - F.count("*")) * F.lit(1 << _MAX_RANK)
        ).alias("reg_sum"),
    )
    raw = F.lit(_EST_NUM) / F.col("reg_sum").cast("double")
    zeros = (F.lit(_M_REG) - F.col("n_buckets_hit")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * _M_REG)) & (zeros > 0),
        F.lit(float(_M_REG)) * F.log(F.lit(float(_M_REG)) / zeros),
    ).otherwise(raw)
    return per_group.withColumn("hll_est", est)


def hll_distinct_sql(
    src_cte: str, group_cols: list[str], id_col: str
) -> str:
    """DuckDB twin of :func:`hll_distinct`: binds ``hll_out`` with the
    same columns; select from it. Identical integer ops end-to-end; the
    float estimate divides/logs identical operands."""
    gc = ", ".join(group_cols)
    h = _mix_sql(f"CAST({id_col} AS BIGINT)")
    rank = _smear_rank_sql(f"(({h}) // {_M_REG})")
    return f"""
    hll_ranked AS (
      SELECT {gc}, (({h}) % {_M_REG}) AS bucket, {rank} AS rnk
      FROM {src_cte}
    ),
    hll_regs AS (
      SELECT {gc}, bucket, MAX(rnk) AS max_rank, COUNT(*) AS n
      FROM hll_ranked GROUP BY {gc}, bucket
    ),
    hll_groups AS (
      SELECT {gc}, CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
             CAST(SUM(CAST(1 AS BIGINT) << ({_MAX_RANK} - max_rank)) AS BIGINT)
               + ({_M_REG} - COUNT(*)) * (CAST(1 AS BIGINT) << {_MAX_RANK})
               AS reg_sum
      FROM hll_regs GROUP BY {gc}
    ),
    hll_out AS (
      SELECT {gc}, n_rows, n_buckets_hit, reg_sum,
             CASE WHEN CAST({_EST_NUM!r} AS DOUBLE)
                       / CAST(reg_sum AS DOUBLE) <= CAST({2.5 * _M_REG!r} AS DOUBLE)
                   AND ({_M_REG} - n_buckets_hit) > 0
                  THEN CAST({_M_REG} AS DOUBLE)
                       * ln(CAST({_M_REG} AS DOUBLE)
                            / CAST({_M_REG} - n_buckets_hit AS DOUBLE))
                  ELSE CAST({_EST_NUM!r} AS DOUBLE)
                       / CAST(reg_sum AS DOUBLE)
             END AS hll_est
      FROM hll_groups
    )
    """


def hll_mix_py(x: int) -> int:
    """Scalar twin of :func:`_mix_col` for tests."""
    h = x
    for (mul_lo, mul_hi), sh in zip(_ROUNDS, _SHIFTS):
        h = ((h % _H) * mul_lo + (h // _H) * mul_hi) % _M
        h = h ^ (h >> sh)
    return h


def hll_estimate_py(ids) -> float:
    """Scalar HLL twin over an iterable of ids (tests/accuracy checks)."""
    import math

    regs = [0] * _M_REG
    for x in ids:
        h = hll_mix_py(int(x))
        b = h % _M_REG
        v = h // _M_REG
        rank = _MAX_RANK - (v.bit_length() if v else 0)
        regs[b] = max(regs[b], rank)
    reg_sum = sum(1 << (_MAX_RANK - r) for r in regs)
    raw = _ALPHA * _M_REG * _M_REG * float(1 << _MAX_RANK) / float(reg_sum)
    zeros = regs.count(0)
    if raw <= 2.5 * _M_REG and zeros > 0:
        return float(_M_REG) * math.log(float(_M_REG) / zeros)
    return raw


_BLOOM_K = 3  # hash functions (Kirsch-Mitzenmacher double hashing)


_BLOOM_WORD = 63  # bits per word: shifts stay <= 62, so `1 << bit` never
# overflows BIGINT — DuckDB raises on 1 << 63 where Spark wraps silently,
# and the filter must be bit-identical across engines


def _bloom_positions(df: DataFrame, keep: list[str], id_col: str, n_words: int) -> DataFrame:
    """Explode each id into its _BLOOM_K (word, mask) bit positions.

    Double hashing over the 61-bit mix: h1 = h mod m, h2 = 1 + (h >> 13)
    mod (m - 1); position_j = (h1 + j*h2) mod m. All non-negative BIGINT
    arithmetic, identical in the SQL twin."""
    m_bits = n_words * _BLOOM_WORD
    mixed = mix_chain(df, keep, id_col, "_bh")
    h1 = F.col("_bh") % m_bits
    h2 = F.lit(1) + F.shiftrightunsigned("_bh", 13) % (m_bits - 1)
    j = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("_j")
    pos = (h1 + F.col("_j") * h2) % m_bits
    return (
        mixed.select(*keep, "_bh", j)
        .select(*keep, pos.alias("_pos"))
        .select(
            *keep,
            (F.col("_pos") / _BLOOM_WORD).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_BLOOM_WORD} AS INT))"
            ).alias("mask"),
        )
    )


def bloom_build(df: DataFrame, id_col: str, n_words: int = 512) -> DataFrame:
    """Build ONE Bloom filter over ``id_col`` as ``n_words`` 63-bit words:
    (word_idx, word) rows, ``word`` the bit_or of every member's masks —
    an order-independent aggregate, so the filter is partition-invariant
    and two partial filters merge by bit_or exactly like any built-in agg.
    At 10^12 rows the shuffle carries one row per (partition, word) —
    bounded at ``n_words`` x partitions — and the result (a few KB)
    broadcasts to prune the probe side of a semi-join before the real
    exchange (the runtime-filter idiom Spark's own bloom-join uses).
    Absent words mean zero; size for ~10 bits/member (m/n >= 10 keeps the
    k=3 false-positive rate under ~1 %)."""
    pos = _bloom_positions(df, [], id_col, n_words)
    return pos.groupBy("word_idx").agg(F.expr("bit_or(mask)").alias("word"))


def bloom_probe(
    probe: DataFrame, filt: DataFrame, id_col: str, n_words: int = 512
) -> DataFrame:
    """Test every probe row against the filter: appends ``might_contain``
    (TRUE iff all _BLOOM_K bits are set — no false negatives, bounded
    false positives). The filter side joins broadcast on word_idx; the
    verdict is one count-of-matched-bits == k per id."""
    pos = _bloom_positions(probe, [id_col], id_col, n_words)
    joined = pos.join(F.broadcast(filt), "word_idx", "left").select(
        id_col,
        (
            F.col("word").isNotNull()
            & (F.col("word").bitwiseAND(F.col("mask")) == F.col("mask"))
        ).cast("int").alias("_hit"),
    )
    verdict = joined.groupBy(id_col).agg(
        (F.sum("_hit") == F.lit(_BLOOM_K)).alias("might_contain")
    )
    return probe.join(verdict, id_col)


def bloom_sql(
    members_cte: str, probe_cte: str, id_col: str, probe_id: str,
    n_words: int = 512,
) -> str:
    """DuckDB twin: builds the filter from ``members_cte.{id_col}``,
    probes ``probe_cte.{probe_id}``; binds ``bl_verdict`` with
    (``{probe_id}``, might_contain)."""
    m_bits = n_words * _BLOOM_WORD
    def positions(cte: str, col: str) -> str:
        h = _mix_sql(f"CAST({col} AS BIGINT)")
        return f"""(
      SELECT {col} AS id,
             ((h % {m_bits}) + j * (1 + (h >> 13) % {m_bits - 1})) % {m_bits} AS pos
      FROM (SELECT {col}, {h} AS h FROM {cte}) t
      CROSS JOIN (SELECT UNNEST(range(0, {_BLOOM_K})) AS j) js
    )"""
    return f"""
    bl_words AS (
      SELECT pos // {_BLOOM_WORD} AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD} AS INTEGER)) AS word
      FROM {positions(members_cte, id_col)} mp GROUP BY 1
    ),
    bl_probe_pos AS (
      SELECT id AS {probe_id}, pos // {_BLOOM_WORD} AS word_idx,
             CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD} AS INTEGER) AS mask
      FROM {positions(probe_cte, probe_id)} pp
    ),
    bl_verdict AS (
      SELECT {probe_id},
             (SUM(CASE WHEN w.word IS NOT NULL
                        AND (w.word & p.mask) = p.mask
                       THEN 1 ELSE 0 END) = {_BLOOM_K}) AS might_contain
      FROM bl_probe_pos p LEFT JOIN bl_words w USING (word_idx)
      GROUP BY {probe_id}
    )
    """


_CMS_D = 4  # count-min depth (rows)


def _cms_positions(df: DataFrame, keep: list[str], id_col: str, w: int) -> DataFrame:
    """Explode each id into its _CMS_D (row, pos) counter coordinates —
    the same Kirsch-Mitzenmacher double hashing the Bloom filter uses,
    one derived hash per sketch row."""
    mixed = mix_chain(df, keep, id_col, "_ch")
    h1 = F.col("_ch") % w
    h2 = F.lit(1) + F.shiftrightunsigned("_ch", 13) % (w - 1)
    r = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("row")
    return (
        mixed.select(*keep, "_ch", r)
        .select(*keep, "row", ((h1 + F.col("row") * h2) % w).alias("pos"))
    )


def cms_build(df: DataFrame, id_col: str, w: int = 1024) -> DataFrame:
    """Count-Min sketch of the ``id_col`` stream: d=4 rows of ``w``
    counters as sparse (row, pos, cnt) — each occurrence increments one
    counter per row, so the build is ONE map-side-combined groupBy whose
    shuffle is bounded at d*w rows regardless of stream size, and two
    sketches MERGE by adding counters (a plain sum aggregate). The
    estimate for any id is min over rows of its counter — an upper bound
    that never undercounts (one-sided error: E[overcount] <= stream/w
    per row, and the min over d independent rows drives it down). The
    heavy-hitter / frequency primitive at 10^12 rows, where exact
    per-key counts of a hot-key-skewed stream are the thing you're
    trying to avoid shuffling."""
    pos = _cms_positions(df, [], id_col, w)
    return pos.groupBy("row", "pos").agg(F.count("*").alias("cnt"))


def cms_estimate(
    keys: DataFrame, sketch: DataFrame, id_col: str, w: int = 1024
) -> DataFrame:
    """Estimate each key's stream frequency from the sketch: appends
    ``cms_est`` = min over the d rows of the key's counter (0 via
    coalesce when a counter was never touched — only possible for keys
    absent from the stream). Broadcast equi-join on (row, pos)."""
    pos = _cms_positions(keys, [id_col], id_col, w)
    joined = pos.join(F.broadcast(sketch), ["row", "pos"], "left").select(
        id_col, F.coalesce("cnt", F.lit(0).cast("long")).alias("_c")
    )
    est = joined.groupBy(id_col).agg(F.min("_c").alias("cms_est"))
    return keys.join(est, id_col)


def cms_sql(stream_cte: str, keys_cte: str, id_col: str, key_id: str, w: int = 1024) -> str:
    """DuckDB twin: sketch from ``stream_cte.{id_col}``, estimates for
    ``keys_cte.{key_id}``; binds ``cm_est`` (``{key_id}``, cms_est)."""
    def positions(cte: str, col: str) -> str:
        h = _mix_sql(f"CAST({col} AS BIGINT)")
        return f"""(
      SELECT {col} AS id, r AS row,
             ((h % {w}) + r * (1 + (h >> 13) % {w - 1})) % {w} AS pos
      FROM (SELECT {col}, {h} AS h FROM {cte}) t
      CROSS JOIN (SELECT UNNEST(range(0, {_CMS_D})) AS r) rs
    )"""
    return f"""
    cm_sketch AS (
      SELECT row, pos, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {positions(stream_cte, id_col)} sp GROUP BY row, pos
    ),
    cm_est AS (
      SELECT id AS {key_id}, MIN(COALESCE(s.cnt, 0)) AS cms_est
      FROM {positions(keys_cte, key_id)} kp
      LEFT JOIN cm_sketch s USING (row, pos)
      GROUP BY id
    )
    """


__all__ = [
    "hll_distinct",
    "hll_distinct_sql",
    "hll_mix_py",
    "hll_estimate_py",
    "mix_chain",
    "bloom_build",
    "bloom_probe",
    "bloom_sql",
    "cms_build",
    "cms_estimate",
    "cms_sql",
]
