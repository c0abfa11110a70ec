"""Bounded-state sketches: Count-Min token counting / heavy-hitter
detection (Cormode & Muthukrishnan 2005, "An improved data stream
summary: the count-min sketch and its applications") and HyperLogLog
distinct-token cardinality (Flajolet, Fusy, Gandouet & Meunier 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm").

The sketch is a ``depth × width`` counter grid: every token occurrence
increments, for each row ``d``, the cell ``hash_d(term) mod width``; the
estimate for a term is the MIN over rows of its cells. Guarantees:
estimates never UNDERcount (pure overestimate from collisions), and with
depth d / width w the overestimate exceeds εN with probability ≤ e^-d
(ε = e/w) — so a 4×4096 grid (128 KiB of longs) answers "is this token
hot?" over any corpus size. That bounded state is the point at 100 TB:
the grid is the only shuffle-reduced aggregate a streaming admission
filter or a skew-salting decision needs, where an exact per-term count
table is vocabulary-sized and a full sort is corpus-sized.

Hash rows are the engine's 60-bit md5 over ``"{d}#" || term`` — no RNG,
bit-reproducible in the DuckDB oracle (``oracle.cms_heavy_hitters_sql``).

Scale shape: one token-explode pass with map-side-combined term rollup
(the occurrence-stream and rollup formulations are identical by
commutativity of +, so the grid is built from the vocabulary-sized count
table rather than re-scanning the corpus ``depth`` times); the grid
itself broadcasts to probe any candidate set. No driver actions beyond
the broadcast, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import MD5_LONG_BITS, md5_long
from transmog_spark.operators.text import ws_tokens


def _term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact"))
    )


def cms_sketch(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """The counter grid: (d, bucket, cnt) — at most ``depth × width``
    rows regardless of corpus size."""
    counts = _term_counts(df, id_col, text_col)
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    md5_long(F.concat(F.lit(f"{d}#"), F.col("term"))), width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("__r"), "exact")
        .groupBy(F.col("__r.d").alias("d"), F.col("__r.bucket").alias("bucket"))
        .agg(F.sum("exact").alias("cnt"))
    )


def hll_registers(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    p: int = 12,
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): bucket = top
    ``p`` bits of the 60-bit md5 term hash, register = max over the
    bucket's terms of rho (1 + leading-zero count of the remaining
    ``60 - p`` bits). At most ``m = 2**p`` rows regardless of corpus
    size — like the CMS grid, bounded state is the point: distinct-token
    cardinality over 100 TB costs one map-side-combined pass and an
    m-row aggregate, where exact countDistinct shuffles the vocabulary.

    rho is computed from ``length(bin(rest))`` — the binary string drops
    leading zeros in both engines, so ``floor(log2)`` never touches
    doubles and the register is bit-identical in the DuckDB oracle.
    """
    rest_bits = MD5_LONG_BITS - p
    h = md5_long(F.col("term"))
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    return (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("term"))
        .select(
            F.shiftright(h, rest_bits).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, *, p: int = 12) -> DataFrame:
    """One-row estimate (m, n_present, hll_est) from a register table —
    the read side of a maintained/merged register store. Exact-integer
    scaled harmonic denominator; see ``hll_distinct`` for the math."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # scale must cover the max register 60 - p + 1 so the shift amount
    # scale - reg stays >= 0 for EVERY p (a hardcoded 49 only covered
    # p >= 12; below that the negative shift wraps mod 64 in the JVM and
    # the estimate is silently garbage). m * 2^scale = 2^61 < 2^63 — the
    # exact long sum never overflows. p = 12 keeps scale = 49.
    scale = 61 - p
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {scale} - reg)")), F.lit(0)
        ).alias("__cells"),
    )
    zeros = F.lit(m) - F.col("n_present")
    denom_scaled = F.col("__cells") + zeros * F.lit(1 << scale)
    raw = F.lit(alpha * m * m * float(1 << scale)) / denom_scaled
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("n_present").cast("long").alias("n_present"),
        F.round(est, 4).alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    p: int = 12,
) -> DataFrame:
    """One-row HLL cardinality estimate next to the exact count:
    (m, n_present, hll_est, exact_distinct, rel_err_pct).

    The harmonic-mean denominator sums ``2^(-reg)`` — a float whose
    addition order differs across engines/partitionings — so it is kept
    EXACT: each register contributes the integer ``2^(S - reg)``
    (S = 61 - p covers the max register ``60 - p + 1`` for every p;
    49 at the default p = 12) and absent buckets contribute
    ``2^S``; the long sum is order-independent and bit-identical in
    DuckDB, and the single final division is the only float op. Small-
    range linear counting (est = m * ln(m / zeros) when raw <= 2.5m and
    zeros > 0) follows the paper; round(…, 4) on both engines absorbs
    libm-vs-StrictMath ulp drift in ln.
    """
    est = hll_estimate(hll_registers(df, id_col, text_col, p=p), p=p)
    exact = df.select(
        F.explode(ws_tokens(F.col(text_col))).alias("term")
    ).agg(F.countDistinct("term").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "m",
        "n_present",
        "hll_est",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.when(F.col("exact_distinct") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("hll_est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                * 100.0,
                4,
            )
        )
        .alias("rel_err_pct"),
    )


def hdr_histogram(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 32,
    group_by: list[str] | None = None,
) -> DataFrame:
    """HDR-histogram bucket table for a non-negative integer column —
    the mergeable bounded-state quantile sketch completing this module's
    family (CMS counts, HLL distincts, HDR quantiles).

    Bucketing is Gene Tene's HdrHistogram scheme (power-of-two exponent ×
    ``k`` linear sub-buckets; same guarantee class as DDSketch, Masson et
    al., VLDB 2019): with ``u = v + 1`` and ``s = max(0, bit_length(u) -
    1 - log2(k))``, the index is ``s*k + (u >> s)`` — relative error
    ≤ 1/k, and for ``u < 2k`` buckets are exact singletons. ALL integer
    math (``length(bin(u))`` gives the exact bit length in both engines;
    shifts are Catalyst ``shiftright`` with a per-row amount via
    ``F.expr``), so the sketch is bit-identical in the DuckDB oracle —
    no log/pow doubles anywhere near a bucket boundary.

    Output: ``group_by + (bucket, cnt)`` — at most ~``k * 64`` rows per
    group regardless of corpus size, mergeable across partitions, batches
    and stores by ``groupBy(bucket).sum(cnt)`` (same merge law as the CMS
    grid). That bounded mergeable state is the 100 TB point: per-source
    length/token-count quantiles cost one map-side-combined pass, where
    exact percentiles sort the corpus and ``percentile_approx`` state
    doesn't cross engines.
    """
    b = _hdr_b(k)
    groups = list(group_by or [])
    u = (F.col(value_col).cast("long") + F.lit(1)).alias("__u")
    # drop NULL values explicitly: unlike CMS/HLL (whose token explode
    # naturally skips null text), a NULL here would land in a NULL bucket
    # that inflates totals and sorts FIRST in Spark but LAST in DuckDB —
    # silently biasing quantiles in opposite directions per engine
    staged = df.where(F.col(value_col).isNotNull()).select(*groups, u)
    s = F.expr(f"greatest(0, length(bin(__u)) - 1 - {b})")
    idx = (s * F.lit(k) + F.expr("shiftright(__u, __s)")).cast("long")
    return (
        staged.withColumn("__s", s.cast("int"))
        .select(*groups, idx.alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _hdr_b(k: int) -> int:
    """log2(k) with the shared power-of-two contract check — decode with a
    ``k`` different from the histogram's produces silently wrong bounds,
    so every entry point validates; stores record their ``hdr_k`` in meta
    (streaming/sketch.py) and readers must pass that value."""
    b = k.bit_length() - 1
    if k != (1 << b) or k < 2:
        raise ValueError(f"k must be a power of two >= 2, got {k}")
    return b


def hdr_bucket_bounds(k: int = 32):
    """(lo, hi) value bounds of a bucket index as integer Columns:
    ``s = max(0, bucket div k - 1)``, ``m = bucket - s*k``, value range
    ``[m << s, ((m+1) << s) - 1]`` shifted back by the ``u = v + 1``
    offset. Exact longs — decode never touches floats either."""
    _hdr_b(k)
    s = f"greatest(0, bucket div {k} - 1)"
    m = f"(bucket - {s} * {k})"
    lo = F.expr(f"shiftleft({m}, cast({s} as int))") - F.lit(1)
    hi = F.expr(f"shiftleft({m} + 1, cast({s} as int))") - F.lit(2)
    return lo, hi


def hdr_quantiles(
    hist: DataFrame,
    qs: list[float],
    *,
    k: int = 32,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Quantile read over an HDR bucket table (the read side of a
    maintained/merged store): for each q, the first bucket whose running
    count reaches ``ceil(q * total)``, decoded to its integer value range.

    Output: ``group_by + (q, bucket, est_lo, est_hi)`` with the true
    q-quantile guaranteed inside ``[est_lo, est_hi]`` and
    ``est_hi/est_lo - 1 <= 1/k``. The rank compare runs on a long running
    sum; ``ceil(q*total)`` is the only float op and both engines evaluate
    it on identical IEEE doubles.
    """
    from pyspark.sql import Window

    groups = list(group_by or [])
    w_cum = (
        Window.partitionBy(*[F.col(g) for g in groups])
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*[F.col(g) for g in groups])
    cum = hist.select(
        *groups,
        "bucket",
        F.sum("cnt").over(w_cum).alias("__cum"),
        F.sum("cnt").over(w_all).alias("__total"),
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    hit = (
        cum.select(*groups, "bucket", "__cum", "__total", F.explode(qarr).alias("q"))
        .where(F.col("__cum") >= F.ceil(F.col("q") * F.col("__total")))
        .groupBy(*groups, "q")
        .agg(F.min("bucket").alias("bucket"))
    )
    lo, hi = hdr_bucket_bounds(k)
    return hit.select(*groups, "q", "bucket", lo.alias("est_lo"), hi.alias("est_hi"))


def hdr_value_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    *,
    k: int = 32,
    group_by: list[str] | None = None,
) -> DataFrame:
    """One-pass convenience: sketch + quantile read, with the EXACT
    discrete q-quantile riding along (same rank definition on a value-
    ordered running count) so the ≤1/k containment is visible per row:
    ``group_by + (q, bucket, est_lo, est_hi, exact_q, contained)``."""
    from pyspark.sql import Window

    groups = list(group_by or [])
    est = hdr_quantiles(
        hdr_histogram(df, value_col, k=k, group_by=groups), qs, k=k, group_by=groups
    )
    v = F.col(value_col).cast("long")
    w_cum = (
        Window.partitionBy(*[F.col(g) for g in groups])
        .orderBy(v.asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*[F.col(g) for g in groups])
    ranked = df.where(F.col(value_col).isNotNull()).select(
        *groups,
        v.alias("__v"),
        F.count(F.lit(1)).over(w_cum).alias("__cum"),
        F.count(F.lit(1)).over(w_all).alias("__total"),
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    exact = (
        ranked.select(*groups, "__v", "__cum", "__total", F.explode(qarr).alias("q"))
        .where(F.col("__cum") >= F.ceil(F.col("q") * F.col("__total")))
        .groupBy(*groups, "q")
        .agg(F.min("__v").alias("exact_q"))
    )
    on = groups + ["q"]
    return est.join(exact, on=on).select(
        *on,
        "bucket",
        "est_lo",
        "est_hi",
        "exact_q",
        ((F.col("exact_q") >= F.col("est_lo")) & (F.col("exact_q") <= F.col("est_hi"))).alias(
            "contained"
        ),
    )


def cms_heavy_hitters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 256,
    threshold: int = 100,
) -> DataFrame:
    """Terms whose CMS estimate reaches ``threshold``: (term, cms_est,
    exact, overcount). The estimate is min-over-rows of the broadcast
    grid's probed cells; ``exact`` rides along from the same rollup so the
    overestimate-only guarantee is visible (``overcount = cms_est - exact
    >= 0`` always — pinned by tests). The threshold decision is made on
    the SKETCH estimate, as a bounded-state consumer would make it, so
    recall is exact (no underestimates) and false positives are the
    documented collision overcounts.
    """
    counts = _term_counts(df, id_col, text_col)
    sketch = cms_sketch(df, id_col, text_col, depth=depth, width=width)
    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    md5_long(F.concat(F.lit(f"{d}#"), F.col("term"))), width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probed = counts.select(
        "term", "exact", F.explode(probes).alias("__p")
    ).join(
        F.broadcast(sketch),
        (F.col("__p.d") == F.col("d")) & (F.col("__p.bucket") == F.col("bucket")),
    )
    return (
        probed.groupBy("term", "exact")
        .agg(F.min("cnt").alias("cms_est"))
        .where(F.col("cms_est") >= threshold)
        .select(
            "term",
            "cms_est",
            "exact",
            (F.col("cms_est") - F.col("exact")).alias("overcount"),
        )
    )
