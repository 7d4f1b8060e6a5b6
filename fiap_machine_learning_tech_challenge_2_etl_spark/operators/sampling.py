"""Deterministic hash-based sampling and dataset splitting.

``df.sample()`` is seed-stable only for a FIXED partitioning — repartition
the input and the sample changes, which makes it useless as a contract
("this doc is in the validation set") and impossible to oracle-test. These
operators instead key every decision on a 60-bit md5 of a stable row key
(``dedup.token_hash60`` — replicable bit-for-bit in any engine), so:

* membership is a pure function of the row, invariant under partitioning,
  ordering, cluster size, and engine — the property a training pipeline
  needs so train/val/test never leak into each other across reruns;
* the filter is a plain Catalyst expression: it pushes into scans, costs no
  shuffle, and composes with pruning (sample-then-aggregate never
  materializes the rejected rows);
* at 100 TB the split is embarrassingly parallel — no global count, no
  driver round-trip, unlike `randomSplit` (which also re-rolls per run).

The reference engine has no sampling surface (SURVEY.md §2.13); the closest
prior art is the salt-free hash-mod idiom used for A/B bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.operators.dedup import token_hash60
from fiap_machine_learning_tech_challenge_2_etl_spark.util import reject_reserved as _reject_reserved
from fiap_machine_learning_tech_challenge_2_etl_spark.util import validate_interval_body

BUCKETS = 10_000


def hash_bucket(key: str | Column, salt: str = "") -> Column:
    """[0, BUCKETS) bucket from the md5-60bit of (salt || key-as-string)."""
    key_col = F.col(key) if isinstance(key, str) else key
    return token_hash60(F.concat(F.lit(salt), key_col.cast("string"))) % BUCKETS


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by hash bucket."""
    return df.filter(hash_bucket(key, salt) < int(round(fraction * BUCKETS)))


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name; weights must sum to ~1. Buckets
    are assigned to splits in dict order as contiguous ranges, so a later
    re-weighting only moves rows across adjacent boundaries."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(key, salt)
    expr: Column | None = None
    hi = 0
    names = list(weights)
    for name in names[:-1]:
        hi += int(round(weights[name] * BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of the rare ones) — the corpus-rebalancing step of
    a training-data pipeline, as a single pushdown-able filter."""
    default = F.lit(int(round(default_fraction * BUCKETS)))
    expr: Column | None = None
    for s, f in fractions.items():
        cond = F.col(strata) == s
        lim = F.lit(int(round(f * BUCKETS)))
        expr = F.when(cond, lim) if expr is None else expr.when(cond, lim)
    thresh = default if expr is None else expr.otherwise(default)
    return df.filter(hash_bucket(key, salt) < thresh)


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: str | Column,
    k: int,
    salt: str = "",
    score_col: str = "sample_score",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Efraimidis–Spirakis one-pass key method: each row gets score
    u^(1/w) with u uniform in (0,1); the k largest scores are a correct
    weighted sample. Here u derives from the md5 hash of (salt || key),
    so the "randomness" is reproducible run-to-run, engine-to-engine,
    and partitioning-to-partitioning — the property a quality-weighted
    corpus subset needs to be auditable.

    Scale posture: the score is a map-side expression; top-k is
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
    never a global sort). One pass, no shuffle beyond k rows per
    partition. Rows with weight <= 0 are excluded (zero mass).
    """
    _reject_reserved(df, score_col)  # withColumn would silently overwrite
    w_col = F.col(weight) if isinstance(weight, str) else weight
    u = (hash_bucket(key, salt).cast("double") + 0.5) / BUCKETS  # (0,1) open
    score = F.pow(u, 1.0 / w_col.cast("double"))
    out = (
        df.filter(w_col > 0)
        .withColumn(score_col, F.round(score, 9))
        .orderBy(F.col(score_col).desc(), F.col(key))
        .limit(k)
    )
    return out


def temporal_split_embargo(
    df: DataFrame,
    ts_col: str,
    cutoff_fraction: float = 0.8,
    embargo: str = "0 seconds",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split: rows at or before the
    ``cutoff_fraction`` timestamp quantile are 'train', rows after
    cutoff + ``embargo`` are 'test', and rows inside the embargo window are
    dropped. The embargo gap is what keeps overlapping-horizon features
    (rolling windows, labels that look ``embargo`` into the future) from
    leaking across the boundary — a random split cannot provide this.

    The cutoff is an EXACT timestamp percentile (one aggregate row,
    broadcast back); labeling is a map-side expression. Deterministic for
    a given dataset — no RNG anywhere."""
    cut = df.agg(
        F.expr(
            f"percentile(unix_micros({ts_col}), {cutoff_fraction})"
        ).alias("__cut_us")
    ).select(F.floor(F.col("__cut_us")).cast("long").alias("__cut_us"))
    emb = F.expr(f"INTERVAL {validate_interval_body(embargo, 'embargo')}")
    labeled = (
        df.join(F.broadcast(cut))
        .withColumn("__cut_ts", F.timestamp_micros(F.col("__cut_us")))
        .withColumn(
            split_col,
            F.when(F.col(ts_col) <= F.col("__cut_ts"), F.lit("train")).when(
                F.col(ts_col) > F.col("__cut_ts") + emb, F.lit("test")
            ),
        )
        .filter(F.col(split_col).isNotNull())
        .drop("__cut_us", "__cut_ts")
    )
    return labeled


def rebalance_to_min_group(
    df: DataFrame, group_col: str, key_col: str, salt: str = "mix"
) -> DataFrame:
    """Down-sample every group to (approximately) the size of the SMALLEST
    group — the mixture-rebalancing step that equalizes source/domain
    proportions before training (the down-sampling dual of
    ``quality_upsample_repeat``).

    Per-group keep thresholds are exact integers
    (``min_count * BUCKETS div count_g`` — BIGINT division, no floats),
    and membership is the usual ``hash_bucket(key, salt) < threshold``
    pure-function-of-the-row decision: invariant under partitioning and
    rerun, replicable in any engine, and it composes with pruning. The
    kept count per group is Binomial-tight around ``min_count`` — the
    honest 100 TB design, because an EXACT-count rebalance needs a
    per-group order statistic (a global per-key sort or top-k with
    k = min_count ~ billions), which no sane plan pays for a sampling
    step. The group-size aggregate is one tiny hash agg; thresholds
    broadcast back; the filter is map-side.

    Returns the kept rows of ``df`` (all original columns)."""
    # NULL group values would silently vanish in the threshold equi-join
    # below; drop them explicitly so the contract is visible (a NULL
    # domain/source is not a mixture component)
    df = df.filter(F.col(group_col).isNotNull())
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    thresholds = counts.join(
        F.broadcast(counts.agg(F.min("__n").alias("__min_n")))
    ).select(
        group_col,
        F.expr(f"__min_n * {BUCKETS} div __n").cast("long").alias("__thr"),
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(hash_bucket(key_col, salt) < F.col("__thr"))
        .drop("__thr")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_col: str,
    alpha: float,
    target_frac: float,
    salt: str = "temp",
    rate_col: str = "keep_rate",
) -> DataFrame:
    """Temperature-flattened mixture sampling: resample groups so the kept
    corpus follows q_g proportional to p_g**alpha (p_g = the group's share of
    total ``weight_col`` mass) at an overall kept-mass fraction of
    ``target_frac`` — the standard rebalancing step for multilingual /
    multi-source LLM corpora (alpha=1 keeps natural proportions, alpha=0
    targets uniform, alpha~0.3 is the usual middle ground). Groups whose
    boosted rate would exceed 1 are clipped (sampling can only
    down-weight; up-weighting is quality_upsample_repeat's job).

    Per-group keep rate: ``min(1, target_frac * q_g / p_g)`` rounded to
    6 dp so the threshold is engine-replicable; membership is the usual
    ``hash_bucket(key, salt) < rate * BUCKETS`` pure-function-of-the-row
    decision (deterministic, partitioning-invariant, auditable).

    Scale posture: one tiny per-group mass aggregate (group domain =
    languages/sources, bounded), two single-partition window passes over
    that TINY frame only (never the corpus) for the cross-group
    normalizations, broadcast of the rates back, map-side filter. NULL
    groups are not mixture components and are dropped explicitly, as are
    rows with NULL or non-positive weight (zero mass — like
    weighted_sample_per_group; without the filter a NULL-mass group's
    rate is NULL and its rows vanish silently, and a negative mass makes
    pow(p, alpha) NaN and poisons EVERY group's normalizer).

    Returns kept rows with ``rate_col`` attached (all original columns)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac must be in (0, 1], got {target_frac}")
    # rate_col rides the broadcast join back onto df — a pre-existing
    # column of that name would make the join output ambiguous
    _reject_reserved(df, rate_col)
    from pyspark.sql import Window

    df = df.filter(F.col(group_col).isNotNull() & (F.col(weight_col) > 0))
    w = Window.partitionBy()  # the ≤|groups|-row rates frame, NOT the corpus
    rates = (
        df.groupBy(group_col)
        .agg(F.sum(weight_col).cast("double").alias("__mass"))
        .select(group_col, (F.col("__mass") / F.sum("__mass").over(w)).alias("__p"))
        .select(
            group_col,
            "__p",
            (F.pow("__p", alpha) / F.sum(F.pow("__p", alpha)).over(w)).alias("__q"),
        )
        .select(
            group_col,
            F.round(
                F.least(F.lit(1.0), F.lit(target_frac) * F.col("__q") / F.col("__p")),
                6,
            ).alias(rate_col),
        )
    )
    return df.join(F.broadcast(rates), group_col).filter(
        hash_bucket(key_col, salt) < F.col(rate_col) * BUCKETS
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key: str,
    weight: str | Column,
    k: int,
    salt: str = "",
    score_col: str = "sample_score",
) -> DataFrame:
    """Per-group deterministic weighted sampling without replacement: the
    k largest Efraimidis–Spirakis keys (u^(1/w), u md5-derived — see
    weighted_sample_topk) WITHIN each group — "give me the 5 best-weighted
    docs per language/source", the per-stratum dual of the global top-k.

    Scale posture: the score is a map-side expression and the rank filter
    bounds the window, so Spark plans WindowGroupLimit — a partial top-k
    per input partition BEFORE the shuffle; per-group state is k rows no
    matter how large the group. Ties break on ``key`` for determinism;
    rows with weight <= 0 are excluded (zero mass)."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.windows import top_k_per_group

    _reject_reserved(df, score_col)  # withColumn would silently overwrite
    w_col = F.col(weight) if isinstance(weight, str) else weight
    u = (hash_bucket(key, salt).cast("double") + 0.5) / BUCKETS  # (0,1) open
    scored = df.filter(w_col > 0).withColumn(
        score_col, F.round(F.pow(u, 1.0 / w_col.cast("double")), 9)
    )
    return top_k_per_group(
        scored, [group_col], [F.col(score_col).desc(), F.col(key)], k
    )
