"""DataFrame -> DataFrame operator stages.

Grouped by family (SURVEY.md section 2):
    cleaning    projection, rename, fill, sanitize, cast, key filters, dedup
    windows     rolling stats, group totals, group min-date, rank-in-group
    joins       star-schema equi joins, semi/anti, top-k, set ops
    dedup       LLM-pipeline dedup: exact hash, minhash LSH, simhash, n-gram
                jaccard, embedding-cosine near-dup
    similarity  embedding ANN: brute-force cosine top-k + LSH-bucketed variant
    text        language id, quality scoring, token counts, fingerprinting
    multimodal  binary-column decode/feature plumbing (decode step stubbed)
"""
