"""Deduplication operators for LLM training-data pipelines (extension
surface; north star): exact hash dedup, MinHash + LSH near-dup, SimHash,
n-gram Jaccard. All hashing derives from md5 (available and identical in
Spark and DuckDB), so every signature is deterministic and oracle-checkable
— no engine-specific hash functions in semantics-bearing positions.

Scale design
------------
* exact dedup — one hash-agg shuffle on the content fingerprint (never on
  the raw text: shuffle keys stay 16 bytes at 100 TB).
* MinHash/LSH — explode shingles -> per-doc signature via groupBy(min),
  band-hash -> bucket self-join. Only docs sharing a band bucket are
  compared; the cross product never materializes. Bucket skew (a viral
  boilerplate shingle set) is bounded by AQE skew-join plus the candidate
  distinct step.
* SimHash — explode token hashes x 60 bit positions is avoided: the
  per-bit majority vote runs as one Arrow-batched vectorized UDF over the
  per-doc hash list, chunked along the token axis so the transient bit
  matrix stays ~31 MB even for multi-million-token documents.
* n-gram Jaccard — inverted-index join on shingle hash; common-shingle
  counts via groupBy, set sizes joined back — the classic
  document-similarity-at-scale plan (one shuffle per stage, all equi-joins).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fiap_machine_learning_tech_challenge_2_etl_spark.operators.text import (
    normalize_text,
    ws_tokens,
)
from fiap_machine_learning_tech_challenge_2_etl_spark.util import spread

# MinHash universal-hash parameters: h_i(x) = (A_i * x + B_i) mod P.
# P is a 31-bit prime so A*x stays far inside int64; A/B are fixed odd
# constants derived from the golden-ratio multiplier (public Knuth idiom).
MINHASH_P = 1_000_000_007
_GOLDEN = 2_654_435_761


def _minhash_params(num_perm: int) -> list[tuple[int, int]]:
    return [
        (((_GOLDEN * (i + 1)) % MINHASH_P) | 1, (_GOLDEN * _GOLDEN * (i + 7)) % MINHASH_P)
        for i in range(num_perm)
    ]


def _band_rows(num_perm: int, bands: int) -> int:
    """Rows per LSH band, VALIDATED. bands > num_perm would make every
    band hash the constant hash('') — the self-join then matches every
    doc pair (an O(n^2) blowup returning the full cross product as
    'candidates'); a non-divisible split would silently discard the
    trailing permutations. Both are caller bugs worth a loud error."""
    if not 0 < bands <= num_perm:
        raise ValueError(f"bands must be in [1, num_perm]; got bands={bands}, num_perm={num_perm}")
    if num_perm % bands:
        raise ValueError(
            f"num_perm ({num_perm}) must divide evenly into bands ({bands}); "
            f"{num_perm % bands} trailing permutations would be silently unused"
        )
    return num_perm // bands


def _signature_with_shset(
    df: DataFrame, column: str, id_col: str, shingle_n: int, num_perm: int
) -> DataFrame:
    """ONE corpus pass computing, per doc, the MinHash signature (mh_0..)
    AND the distinct-shingle-hash set (collect_set riding the same
    groupBy). The single semantics-bearing definition of the
    signature+shset derivation — shared by the self-join near-dup
    pipeline and the cross-corpus ingest path so the two can never
    desynchronize from the SQL oracles that replicate it."""
    sh = spread(df, by=id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(column, shingle_n))).alias("shingle"),
    )
    hashed = sh.select(F.col(id_col), token_hash60(F.col("shingle")).alias("h60"))
    aggs = [
        F.min(((F.col("h60") % MINHASH_P) * F.lit(a) + F.lit(b)) % MINHASH_P).alias(
            f"mh_{i}"
        )
        for i, (a, b) in enumerate(_minhash_params(num_perm))
    ]
    return hashed.groupBy(id_col).agg(*aggs, F.collect_set("h60").alias("shset"))


def _band_melt(
    signatures: DataFrame, id_col: str, num_perm: int, bands: int
) -> DataFrame:
    """Melt a signature frame into (id, band_id, band_hash): the band hash
    is ``token_hash60`` of the comma-joined band values (md5-derived, so
    replicable in DuckDB — not Spark's murmur3), and the shuffle key
    stays 8 bytes. Shared by the bucket self-join and the cross-corpus
    new-vs-corpus band join."""
    rows = _band_rows(num_perm, bands)
    band_cols = [
        token_hash60(
            F.concat_ws(",", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = signatures.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("band_hash")
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band_id", "bb.band_hash")


def token_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string: first 15 hex chars of
    md5 (replicable in DuckDB as CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles over normalized text (array of strings).
    Docs shorter than n words yield their single full-text shingle.

    The token array is bound ONCE as a lambda variable (single-element
    array wrapper + outer transform): referencing the tokenizer expression
    directly inside the per-index lambda would make Catalyst re-split the
    document for every shingle — O(words^2) per doc."""
    toks = ws_tokens(col)
    return F.flatten(
        F.transform(
            F.array(toks),
            lambda t: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.array_size(t) - (n - 1), F.lit(1))
                ),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        )
    )


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, column: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact near-identity dedup: group by md5(normalized text), keep the
    smallest id. The groupBy runs partial (map-side) aggregation, and the
    shuffle key is the 32-char digest, not the document body."""
    h = F.md5(normalize_text(column))
    return (
        df.withColumn("fingerprint", h)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: explode distinct shingles, hash each
    to 60 bits, apply ``num_perm`` universal hashes, take per-doc minima in
    one groupBy pass. Output: (id, mh_0 .. mh_{num_perm-1})."""
    sh = spread(df, by=id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(column, shingle_n))).alias("shingle"),
    )
    # hash once in a projection; the 16 agg children then reference one
    # cheap long column (smaller codegen, md5 provably evaluated once)
    hashed = sh.select(
        F.col(id_col), (token_hash60(F.col("shingle")) % MINHASH_P).alias("h")
    )
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % MINHASH_P).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_minhash_params(num_perm))
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_perm/bands`` rows, bucket-join docs agreeing on any full band.
    Returns distinct candidate (a, b) pairs with a < b. The self-join is on
    (band_id, band_hash) — only same-bucket docs meet.

    The band hash is the md5-based ``token_hash60`` of the comma-joined band
    values (not Spark's murmur3 ``hash``): deterministic and replicable in
    DuckDB SQL, so the full LSH pipeline is oracle-checkable end to end.
    The shuffle key stays 8 bytes. ``bands`` must divide ``num_perm``
    (validated in ``_band_rows``)."""
    melted = _band_melt(signatures, id_col, num_perm, bands)
    # both self-join sides shuffle this subtree on the same (band_id,
    # band_hash) key: AQE's ReusedExchange computes it once at runtime, so
    # no persist (a DataFrame persist with no unpersist leaks cache across
    # queries in a long-lived session)
    left = melted.alias("l")
    right = melted.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band_id") == F.col("r.band_id"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup: ONE corpus pass computes, per doc, both
    the MinHash signature and its distinct-shingle-hash set (a collect_set
    riding the same groupBy as the 16 mins); banding yields candidate
    pairs; exact Jaccard verification then just joins the shingle sets onto
    the (few) candidates and intersects arrays. No second pass over the
    corpus, no inverted-index join — at scale the verify cost is
    O(candidates x doc-size), not O(corpus). Output: (id_a, id_b, jaccard),
    value-identical to ``ngram_jaccard_pairs`` on the same pairs."""
    per_doc = _signature_with_shset(df, column, id_col, shingle_n, num_perm)
    cands = lsh_candidate_pairs(per_doc.drop("shset"), id_col, num_perm, bands)
    sets_a = per_doc.select(F.col(id_col).alias("id_a"), F.col("shset").alias("set_a"))
    sets_b = per_doc.select(F.col(id_col).alias("id_b"), F.col("shset").alias("set_b"))
    inter = F.array_size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.array_size(F.col("set_a")) + F.array_size(F.col("set_b")) - inter
    return (
        cands.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index join)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard via inverted index: explode distinct
    shingle hashes, self-join on shingle, count commons, join back set
    sizes. Only pairs sharing >=1 shingle appear. ``max_shingle_freq``
    drops boilerplate shingles (document-frequency cap) — the standard
    guard against quadratic hot-shingle blowup at scale."""
    sh = spread(df, by=id_col).select(
        F.col(id_col), F.explode(F.array_distinct(shingles(column, shingle_n))).alias("s")
    ).withColumn("sh", token_hash60(F.col("s"))).drop("s")
    if max_shingle_freq is not None:
        freq = sh.groupBy("sh").count().filter(F.col("count") <= max_shingle_freq)
        sh = sh.join(freq.select("sh"), "sh", "left_semi")
    # the inverted index is read three times: the two join sides shuffle on
    # the same shingle-hash key (AQE ReusedExchange computes them once);
    # sizes re-scans the corpus — at scale a second columnar scan beats
    # caching the exploded index, and persist-without-unpersist would leak
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, on=[F.col("a.sh") == F.col("b.sh"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    return out.filter(F.col("jaccard") >= min_jaccard) if min_jaccard > 0 else out


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 60  # fits a signed 64-bit long with headroom
# token-axis chunk for the simhash majority vote: bounds the per-doc
# transient bit matrix at chunk x 60 x 8B ~ 31 MB (see simhash._vote)
_VOTE_CHUNK_TOKENS = 65_536


def simhash(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    vote_chunk_tokens: int = _VOTE_CHUNK_TOKENS,
) -> DataFrame:
    """60-bit SimHash: per-token 60-bit md5 hash, per-bit majority vote over
    the document's tokens. Tokenizing and hashing stay JVM-side (so string
    semantics are byte-identical to the SQL oracle); the vote runs as one
    Arrow-batched pandas UDF over the per-doc hash list — exact int64 math
    on a (tokens x 60) bit matrix. This replaces a 60-column conditional-sum
    aggregate whose whole-stage-codegen compile alone cost multiple seconds.
    Output: (id, simhash)."""
    toks = spread(df, by=id_col).select(
        F.col(id_col), F.explode(ws_tokens(column)).alias("tok")
    ).select(id_col, token_hash60(F.col("tok")).alias("th"))
    per_doc = toks.groupBy(id_col).agg(F.collect_list("th").alias("ths"))

    @F.pandas_udf("long")
    def _vote(ths: pd.Series) -> pd.Series:
        import numpy as np

        shifts = np.arange(SIMHASH_BITS)

        def one(h):
            th = np.asarray(h, dtype=np.int64)
            # chunk the token axis: the (tokens x 60) bit matrix is 480
            # bytes/token transient, so an unchunked expansion of a
            # multi-million-token document allocates GBs inside the
            # Python worker (times rows per Arrow batch) — exactly the
            # long-document tail a dedup corpus has. Chunking bounds the
            # transient at ~31 MB while keeping the vote fully
            # vectorized; the counts (and therefore the signature) are
            # bit-identical to the unchunked vote.
            counts = np.zeros(SIMHASH_BITS, dtype=np.int64)
            for start in range(0, len(th), vote_chunk_tokens):
                chunk = th[start : start + vote_chunk_tokens]
                counts += ((chunk[:, None] >> shifts) & 1).sum(axis=0)
            return int((((counts * 2 > len(th)).astype(np.int64)) << shifts).sum())

        return ths.map(one)

    return per_doc.select(F.col(id_col), _vote("ths").alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup: band the 60-bit hash into ``bands`` 15-bit chunks;
    by pigeonhole, hamming<=bands-1 pairs agree on >=1 chunk, so the
    bucket-join on (chunk_id, chunk_value) finds all such pairs without a
    cross product; verify candidates with an exact popcount.

    Scale posture: chunk occupancy is ~n / 2^15 per chunk (simhash values
    of a diverse corpus spread near-uniformly), so the candidate join
    stays linear to roughly 10^6 docs. Unlike the embedding-LSH path
    (``similarity.lsh_band_width``), the chunk width here CANNOT simply
    widen with the corpus — width x bands = 60 is fixed by the pigeonhole
    guarantee (hamming <= bands-1 needs ``bands`` chunks). Past ~10^6
    docs the lever is a LONGER fingerprint (e.g. two independent 60-bit
    simhashes -> 30-bit chunks with the same guarantee relative to 120
    bits — a semantically stricter cut) or pre-partitioning by a cheap
    key (language, length band) so each partition stays under the bound;
    60 bits is kept here because one md5-derived BIGINT is what the
    DuckDB value oracle replicates bit-for-bit."""
    if max_hamming > bands - 1:
        # the pigeonhole guarantee is hamming <= bands-1: beyond it a
        # pair whose differing bits touch every chunk never shares a
        # bucket, so the output would be a silently ARBITRARY subset of
        # the <=max_hamming pairs, not all of them
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole bound of "
            f"bands-1={bands - 1}; raise bands (hamming <= bands-1 pairs "
            "are guaranteed to share a chunk — anything looser silently "
            "drops pairs)"
        )
    if SIMHASH_BITS % bands:
        raise ValueError(f"bands ({bands}) must divide {SIMHASH_BITS}")
    width = SIMHASH_BITS // bands
    sh = simhash(df, column, id_col)
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("chunk_id"),
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("chunk_val"),
                )
                for b in range(bands)
            ])
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk_val")
    # both self-join sides shuffle on (chunk_id, chunk_val): AQE
    # ReusedExchange computes the simhash subtree once — no persist needed
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, on=[F.col("a.chunk_id") == F.col("b.chunk_id"),
                      F.col("a.chunk_val") == F.col("b.chunk_val"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# Incremental cross-corpus dedup (new batch vs existing corpus)
# --------------------------------------------------------------------------


def cross_dedup_status(
    new_batch: DataFrame,
    corpus: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
    shingle_n: int = 3,
) -> DataFrame:
    """Dedup an INCOMING batch against an EXISTING corpus — the per-ingest
    shape of production pipelines (the corpus is petabytes and already
    deduped; only the new slice may be dropped). Returns one row per new
    doc: (id, status) with status in {'exact_dup', 'near_dup', 'kept'}.

    Stage 1 drops new docs whose normalized-content md5 exists in the
    corpus (left-semi on a 16-byte key). Stage 2 MinHash-bands BOTH sides
    and joins new-bands against corpus-bands only — there is NO corpus
    self-join, so the cost is one corpus signature pass (linear, and
    cacheable across ingests in production) plus O(new x collisions)
    verification, never O(corpus^2). Exact-Jaccard verify intersects the
    shingle-hash sets carried on the same groupBy as the signature minima
    (single pass per side, same trick as ``minhash_near_dup_pairs``).

    All hashing is md5-derived, so the full decision vector — which doc
    was dropped at which stage — is replicable in the SQL oracle.

    Two contract bounds callers must know:

    * **The batch is compared against the corpus ONLY, never against
      itself** — that is the no-self-join design, so intra-batch
      duplicates both come back 'kept'. PRECONDITION: dedup the incoming
      batch internally first (``exact_dedup`` + ``minhash_near_dup_pairs``
      over the batch — it is small, so the self-join the corpus cannot
      afford is cheap there), or the merged corpus silently violates the
      already-deduped invariant every later ingest relies on.
    * **Banding recall at the threshold is the S-curve, not 100%**: a
      true-Jaccard-j pair shares >=1 of ``bands`` width-``rows`` bands
      with p = 1-(1-j^rows)^bands; the defaults (16 perms, 8 bands of 2)
      put the 50%-recall midpoint at j ~ 0.29, so borderline pairs AT the
      default 0.2 threshold surface only ~28% of the time (by design the
      exact-verify stage then never false-positives). Tighter screening
      wants more permutations — e.g. num_perm=64, bands=32 moves the
      midpoint to j ~ 0.15, below the threshold — at linear extra
      signature cost. The oracle replays the same banding, so the
      recorded decision vector is exact either way."""
    _band_rows(num_perm, bands)

    norm_hash = F.md5(normalize_text(column))
    nb = new_batch.select(F.col(id_col), F.col(column)).withColumn("__h", norm_hash)
    corpus_hashes = corpus.select(norm_hash.alias("__h")).distinct()
    # NO broadcast hint: the corpus hash set is corpus-sized (the
    # docstring's petabyte regime blows any broadcast limit); AQE
    # broadcasts it at runtime when it actually fits, and otherwise this
    # is a shuffled semi-join on a 16-byte key — the only plan that
    # survives at the scale this function exists for.
    exact_ids = (
        nb.join(corpus_hashes, "__h", "left_semi")
        .select(F.col(id_col).alias("__ex_id"))
        .withColumn("__exact", F.lit(True))
    )

    survivors = nb.join(
        exact_ids, nb[id_col] == exact_ids["__ex_id"], "left_anti"
    ).select(id_col, column)
    new_pd = _signature_with_shset(survivors, column, id_col, shingle_n, num_perm)
    corp_pd = _signature_with_shset(
        corpus.select(F.col(id_col), F.col(column)), column, id_col, shingle_n, num_perm
    )

    cand = (
        _band_melt(new_pd.drop("shset"), id_col, num_perm, bands).alias("n")
        .join(
            _band_melt(corp_pd.drop("shset"), id_col, num_perm, bands).alias("c"),
            on=[
                F.col("n.band_id") == F.col("c.band_id"),
                F.col("n.band_hash") == F.col("c.band_hash"),
            ],
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"), F.col(f"c.{id_col}").alias("corp_id")
        )
        .distinct()
    )
    inter = F.array_size(F.array_intersect(F.col("set_n"), F.col("set_c")))
    union = F.array_size(F.col("set_n")) + F.array_size(F.col("set_c")) - inter
    near_ids = (
        cand.join(
            new_pd.select(F.col(id_col).alias("new_id"), F.col("shset").alias("set_n")),
            "new_id",
        )
        .join(
            corp_pd.select(
                F.col(id_col).alias("corp_id"), F.col("shset").alias("set_c")
            ),
            "corp_id",
        )
        .filter(F.round(inter / union, 6) >= threshold)
        .select(F.col("new_id").alias("__nr_id"))
        .distinct()
        .withColumn("__near", F.lit(True))
    )

    out = (
        nb.join(exact_ids, nb[id_col] == exact_ids["__ex_id"], "left")
        .join(near_ids, nb[id_col] == near_ids["__nr_id"], "left")
        .select(
            F.col(id_col),
            F.when(F.col("__exact"), F.lit("exact_dup"))
            .when(F.col("__near"), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
    return out


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    column: str = "text",
    seg_len: int = 10,
) -> DataFrame:
    """Segment-level (line-level) cross-document deduplication, the
    RefinedWeb/CCNet "line dedup" step adapted to newline-free corpora:
    cut each document's token stream into consecutive ``seg_len``-token
    segments, drop every segment that also occurs in ANOTHER document,
    and reconstruct the cleaned text from the survivors in order. Unlike
    whole-document dedup this removes shared boilerplate (headers,
    navigation, license blocks) from otherwise-unique documents.

    Returns one row per document that has at least one non-empty segment:
    ``(id_col, n_segs, n_kept, n_dropped, clean_text)`` — ``clean_text``
    is '' when everything was boilerplate.

    Scale posture: segmentation is a narrow map (sequence + slice +
    array_join — no UDF, no explode until the segment stream is needed);
    the corpus-wide segment frequency is ONE hash aggregate keyed on the
    segment string with map-side partial ``count(distinct doc)`` collapse;
    the join back to the segment stream is an equi-join on the same key,
    so AQE can plan it off the just-computed frequency sizes. The
    reconstruction re-aggregates by document with
    ``array_sort(collect_list(struct(idx, seg)))`` — per-doc state bounded
    by document length, never by corpus size."""
    t = df.select(id_col, ws_tokens(column).alias("__toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__toks") - 1, F.lit(0)), F.lit(seg_len)
    )
    segs = F.transform(
        starts, lambda s: F.array_join(F.slice(F.col("__toks"), s + 1, seg_len), " ")
    )
    stream = (
        t.select(id_col, F.posexplode(segs).alias("seg_idx", "seg"))
        .filter(F.col("seg") != "")
    )
    freq = stream.groupBy("seg").agg(
        F.countDistinct(id_col).alias("__n_docs")
    )
    kept = stream.join(freq, "seg").filter(F.col("__n_docs") == 1)
    totals = stream.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segs")
    )
    recon = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        totals.join(recon, id_col, "left")
        .select(
            id_col,
            "n_segs",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_segs") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def shingle_containment_pairs(
    df: DataFrame,
    column: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_containment: float = 0.8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Containment near-dup pairs (Broder's containment, not resemblance):
    ``|A∩B| / min(|A|,|B|) >= min_containment`` catches a short document
    EMBEDDED in a longer one — the subset-duplicate case Jaccard
    structurally misses (50 shingles inside 1000 gives Jaccard ~0.05 but
    containment 1.0). Same inverted-index equi-join skeleton as
    ``ngram_jaccard_pairs``, including the document-frequency cap: a
    shingle shared by f documents contributes O(f^2) join rows, so
    boilerplate shingles are dropped above ``max_shingle_freq`` — the
    standard hot-key guard; containment is then exact over the capped
    shingle universe (set sizes count the SAME capped set, so the ratio
    stays internally consistent).

    Output: (id_a, id_b, n_common, containment[6dp]) for qualifying
    pairs, id_a < id_b."""
    # spread(): the shingle explode + md5 is the compute-heavy stage; a
    # low-split parquet scan would serialize it (same guard as
    # ngram_jaccard_pairs)
    sh = (
        spread(df, by=id_col)
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(column, shingle_n))).alias("s"),
        )
        .select(F.col(id_col), token_hash60(F.col("s")).alias("h"))
        .distinct()
    )
    if max_shingle_freq is not None:
        # document-frequency cap as a WINDOW over h, not a groupBy +
        # self-semi-join: the join form re-derived the shingle lineage on
        # both sides (the explode + md5 is the expensive part), the
        # window keeps one exchange and one pass
        w = Window.partitionBy("h")
        sh = (
            sh.withColumn("__f", F.count(F.lit(1)).over(w))
            .filter(F.col("__f") <= max_shingle_freq)
            .drop("__f")
        )
    # materialize the capped inverted index ONCE (eager localCheckpoint):
    # it is read three times below (both self-join sides + the set-size
    # aggregate), DataFrame plans have no subtree reuse, and the r16 job
    # profile showed the explode+md5 stage (4.1 s of task time per pass at
    # sf0.1) recomputed per consumer. Eager, not lazy: the three
    # consumers' stages schedule concurrently and a lazily-materializing
    # checkpoint would race them into duplicate partition computation.
    # Blocks are O(shingle index) — the same order the self-join shuffles
    # anyway — and are reclaimed by the ContextCleaner when the returned
    # frame dies.
    sh = sh.localCheckpoint()
    sz = sh.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.h") == F.col("b.h"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    cont = F.round(
        F.col("n_common") / F.least("sa.n_sh", "sb.n_sh").cast("double"), 6
    )
    return (
        inter.join(sz.alias("sa"), F.col("id_a") == F.col("sa." + id_col))
        .join(sz.alias("sb"), F.col("id_b") == F.col("sb." + id_col))
        .select("id_a", "id_b", "n_common", cont.alias("containment"))
        .filter(F.col("containment") >= min_containment)
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    column: str = "text",
    k: int = 10,
    stride: int = 5,
) -> DataFrame:
    """Overlapping-window exact substring dedup — the seed-and-remove
    variant of ``segment_dedup`` after Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better"): disjoint segments miss
    a duplicated span that straddles a segment boundary, so this cuts
    OVERLAPPING ``k``-token windows every ``stride`` tokens (stride < k),
    finds windows occurring verbatim in more than one document, and
    removes every token position covered by a duplicated window. Any
    duplicated span of at least ``k + stride - 1`` tokens is guaranteed
    to contain a complete shared window regardless of alignment.

    Returns one row per document — including documents whose text is
    NULL/empty/whitespace-only (``n_toks`` 0): ``(id_col, n_toks, n_kept,
    clean_text)``; clean_text is '' when every token was covered.

    Scale posture: windowing is a narrow map (sequence + slice +
    array_join, no UDF); the duplicated-window set is ONE hash aggregate
    on the window string (map-side partial count-distinct collapse);
    coverage is an equi-join back on the same key followed by a bounded
    position explode (k rows per duplicated window, k is a constant);
    survivors are a left-anti join on (doc, position); reconstruction
    re-aggregates per doc with state bounded by document length. The
    window-string shuffle carries ~len/stride strings of k tokens per
    doc — the stride trades shuffle volume against the k+stride-1
    detection floor."""
    if not 1 <= stride <= k:
        raise ValueError(f"need 1 <= stride <= k, got stride={stride}, k={k}")
    t = df.select(id_col, ws_tokens(column).alias("__toks"))
    n = F.size("__toks")
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)), F.lit(stride))
    wins = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.array_join(F.slice(F.col("__toks"), s, k), " ").alias("wstr"),
        ),
    )
    stream = (
        t.select(id_col, n.alias("__n"), F.explode(wins).alias("w"))
        .select(id_col, "__n", F.col("w.start").alias("start"), F.col("w.wstr").alias("wstr"))
        .filter(F.col("wstr") != "")
    )
    dup = (
        stream.groupBy("wstr")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") > 1)
        .select("wstr")
    )
    covered = (
        stream.join(dup, "wstr")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.col("start"),
                    F.least(F.col("start") + F.lit(k - 1), F.col("__n")),
                )
            ).alias("pos"),
        )
        .distinct()
    )
    toks = (
        t.select(id_col, F.posexplode("__toks").alias("pos0", "tok"))
        .filter(F.col("tok") != "")
        .select(id_col, (F.col("pos0") + 1).alias("pos"), "tok")
    )
    surv = toks.join(covered, [id_col, "pos"], "left_anti")
    recon = surv.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    # totals from the per-doc frame, not the token stream: a NULL/empty/
    # whitespace-only document has zero token rows and would otherwise
    # vanish from the output, breaking the one-row-per-document contract
    totals = t.select(
        id_col,
        F.coalesce(  # NULL text -> NULL token array -> size NULL -> 0
            F.size(F.filter("__toks", lambda x: x != "")), F.lit(0)
        )
        .cast("long")
        .alias("n_toks"),
    )
    return totals.join(recon, id_col, "left").select(
        id_col,
        "n_toks",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )
