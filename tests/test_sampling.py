from __future__ import annotations

from pyspark.sql import functions as F

from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import (
    BUCKETS,
    deterministic_sample,
    hash_bucket,
    hash_split,
    stratified_sample,
)


def _docs(spark, sf_dir):
    from fiap_machine_learning_tech_challenge_2_etl_spark.sources.parquet import load_testdata

    return load_testdata(spark, sf_dir, ["documents"])["documents"]


def test_sample_invariant_under_repartition(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(d.repartition(13), "doc_id", 0.3).collect()
    }
    assert a == b
    n = d.count()
    assert 0.15 * n < len(a) < 0.45 * n


def test_split_partitions_are_disjoint_and_exhaustive(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == d.count()
    # nested sampling property: a 0.3 sample is a subset of a 0.5 sample
    s3 = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.3).collect()}
    s5 = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5).collect()}
    assert s3 <= s5


def test_split_weights_must_sum_to_one(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError):
        hash_split(_docs(spark, sf_dir), "doc_id", {"a": 0.5, "b": 0.1})


def test_salt_decorrelates_samples(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5, salt="x").collect()}
    b = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.5, salt="y").collect()}
    assert a != b  # different salts give different (same-rate) samples


def test_stratified_rates_respected(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = stratified_sample(d, "doc_id", "lang", {"en": 0.1}, default_fraction=1.0)
    full = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in full.items():
        if lang == "en":
            assert kept.get("en", 0) < 0.35 * n
        else:
            assert kept[lang] == n  # non-target strata kept whole


def test_bucket_range(spark):
    df = spark.range(1000).select(hash_bucket(F.col("id")).alias("b"))
    row = df.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).first()
    assert 0 <= row["lo"] and row["hi"] < BUCKETS


def test_temperature_mix_rates_and_determinism(spark, sf_dir):
    """alpha-sampling invariants: (a) kept set is deterministic and
    partitioning-invariant; (b) rare groups get HIGHER keep rates than the
    dominant one and rates clip at 1.0; (c) alpha=1 degenerates to a flat
    target_frac rate for every group; (d) the per-group rate matches the
    closed form computed in driver floats."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import temperature_mix

    d = _docs(spark, sf_dir)
    kept = temperature_mix(
        d, group_col="lang", weight_col="n_chars", key_col="doc_id",
        alpha=0.3, target_frac=0.5,
    )
    rates = {
        r["lang"]: r["keep_rate"]
        for r in kept.select("lang", "keep_rate").distinct().collect()
    }
    masses = {
        r["lang"]: r["m"]
        for r in d.groupBy("lang").agg(F.sum("n_chars").alias("m")).collect()
    }
    tot = sum(masses.values())
    z = sum((m / tot) ** 0.3 for m in masses.values())
    for lang, m in masses.items():
        p = m / tot
        want = round(min(1.0, 0.5 * ((p**0.3) / z) / p), 6)
        assert abs(rates[lang] - want) < 1e-9, (lang, rates[lang], want)
    # dominant language is trimmed hardest
    dominant = max(masses, key=masses.get)
    assert rates[dominant] == min(rates.values())

    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in temperature_mix(
            d.repartition(7), group_col="lang", weight_col="n_chars",
            key_col="doc_id", alpha=0.3, target_frac=0.5,
        ).select("doc_id").collect()
    }
    assert ids == ids2 and ids  # deterministic under partitioning

    flat = temperature_mix(
        d, group_col="lang", weight_col="n_chars", key_col="doc_id",
        alpha=1.0, target_frac=0.4,
    )
    assert {
        r["keep_rate"] for r in flat.select("keep_rate").distinct().collect()
    } == {0.4}


def test_temperature_mix_validates_params(spark, sf_dir):
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import temperature_mix

    d = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(d, "lang", "n_chars", "doc_id", alpha=1.5, target_frac=0.5)
    with pytest.raises(ValueError, match="target_frac"):
        temperature_mix(d, "lang", "n_chars", "doc_id", alpha=0.3, target_frac=0.0)


def test_weighted_sample_per_group_k_and_determinism(spark, sf_dir):
    """Per-group ES sampling: exactly min(k, group size) rows per group,
    the SAME rows under any partitioning, scores are the group-local
    largest, and the plan carries a WindowGroupLimit (per-partition
    partial top-k, k rows of state per group)."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _docs(spark, sf_dir).select("lang", "doc_id", "n_chars")
    out = weighted_sample_per_group(
        d, group_col="lang", key="doc_id", weight="n_chars", k=5, salt="wg"
    )
    rows = out.collect()
    per_group: dict = {}
    for r in rows:
        per_group.setdefault(r["lang"], set()).add(r["doc_id"])
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, ids in per_group.items():
        assert len(ids) == min(5, sizes[lang]), (lang, len(ids))

    out2 = weighted_sample_per_group(
        d.repartition(9), group_col="lang", key="doc_id",
        weight="n_chars", k=5, salt="wg",
    )
    assert {(r["lang"], r["doc_id"]) for r in rows} == {
        (r["lang"], r["doc_id"]) for r in out2.collect()
    }

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_psi_drift_zero_on_identical_and_positive_on_shift(spark):
    """PSI invariants: identical snapshots give ~0 on every bucket;
    a location shift gives a strictly positive index; current rows
    outside the baseline range clamp into edge bins (never dropped)."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.profiling import psi_drift

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    same = psi_drift(base, base, "x", nbins=10).collect()
    assert sum(abs(r["psi_term"]) for r in same) < 1e-9
    assert sum(r["n_base"] for r in same) == 1000

    shifted = spark.range(1000).select(
        ((F.col("id") % 100) + 60).cast("double").alias("x")
    )
    drift = psi_drift(base, shifted, "x", nbins=10).collect()
    assert sum(r["psi_term"] for r in drift) > 0.25  # strong shift
    # every shifted row lands in a bucket (values >= 100 clamp to bin 9)
    assert sum(r["n_cur"] for r in drift) == 1000
    top_bin = next(r for r in drift if r["bucket"] == 9)
    assert top_bin["n_cur"] > top_bin["n_base"]  # mass piled into the edge


def test_temperature_mix_zero_mass_rows_dropped_without_poison(spark):
    """NULL / non-positive weights carry no mass: their rows are excluded,
    the remaining groups' rates are unaffected (no NULL-rate silent drop,
    no NaN normalizer poison from negative mass)."""
    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "b", 10), (4, "b", None), (5, "c", -7)],
        "row_id long, grp string, w int",
    )
    kept = temperature_mix(
        df, group_col="grp", weight_col="w", key_col="row_id",
        alpha=1.0, target_frac=1.0,
    )
    rows = kept.collect()
    assert all(r["keep_rate"] == 1.0 for r in rows)  # alpha=1, frac=1
    ids = {r["row_id"] for r in rows}
    assert ids == {1, 2, 3}  # zero-mass rows 4 (NULL) and 5 (negative) out


def test_temperature_mix_rejects_existing_rate_col(spark):
    """rate_col rides the broadcast join back onto df — a pre-existing
    column of that name must be rejected (ambiguous join output), per the
    repo's reject_reserved convention."""
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame(
        [("en", 1.0, "a", 0.5)], "lang string, w double, k string, keep_rate double"
    )
    with pytest.raises(ValueError, match="reserved"):
        temperature_mix(df, "lang", "w", "k", alpha=0.5, target_frac=0.5)


def test_weighted_samplers_reject_existing_score_col(spark):
    """weighted_sample_topk / weighted_sample_per_group must refuse an
    input already carrying score_col instead of silently overwriting it."""
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import (
        weighted_sample_per_group,
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [("en", "a", 1.0, 0.9)],
        "lang string, k string, w double, sample_score double",
    )
    with pytest.raises(ValueError, match="reserved"):
        weighted_sample_topk(df, "k", "w", k=1)
    with pytest.raises(ValueError, match="reserved"):
        weighted_sample_per_group(df, "lang", "k", "w", k=1)


def test_temporal_split_rejects_malformed_embargo(spark):
    """The embargo INTERVAL body is validated eagerly with the parameter
    name, not left to a generic analysis-time parse error."""
    import pytest

    from fiap_machine_learning_tech_challenge_2_etl_spark.operators.sampling import (
        temporal_split_embargo,
    )

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",)], "ts_s string"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError, match="embargo"):
        temporal_split_embargo(df, "ts", embargo="soon")
