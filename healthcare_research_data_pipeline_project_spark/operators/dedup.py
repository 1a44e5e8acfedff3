"""Deduplication operators for large-scale text pipelines
(north-star extensions; designed for 100 TB).

All operators are pure Catalyst expression pipelines (split/HOF/md5)
— no Python UDFs — and all pairwise work is bounded:

- exact:       hash-groupBy on content. One shuffle on the hash.
- minhash+LSH: shingle → k salted min-hashes → band → bucket-join.
               Candidate pairs only form inside identical band-buckets
               (the classic banding guarantee), so the join is an
               equi-join on (band_idx, band_hash) — never a cross
               join. AQE handles hot buckets (boilerplate text).
- simhash:     per-doc bit-string signature; near-dups share prefix
               buckets or low Hamming distance.
- n-gram jaccard: exact verification on candidate pairs (or within
               small blocking groups), distinct-shingle-set overlap.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import track_persist
from ..functions.helpers import round_div
from ..functions.text import (
    SHINGLE_K,
    minhash_col,
    shingle_hashes,
    shingles,
    simhash_bits_col,
    tokens,
)

_log = logging.getLogger("hrdp.dedup")


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups keyed by content hash; keeps min id per
    group (the reference's upsert keeps last-write-wins by PK,
    healthcare-data-pipeline-main.py:622 — here we pick the
    deterministic min)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("toks", tokens(F.col(text_col)))


def with_shingles(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    return with_tokens(df, text_col).withColumn("shingles", shingles("toks", k))


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """Per-doc MinHash signature columns mh_0..mh_{n-1}.

    One md5 per distinct shingle; each component is an affine remap of
    that base hash (functions/text.py MH_COEFFS), so signature cost is
    O(shingles), not O(shingles × components)."""
    base = with_shingles(df, text_col).withColumn(
        "sh_hashes", shingle_hashes("shingles")
    )
    return base.select(
        F.col(id_col), *[minhash_col("sh_hashes", j) for j in range(num_hashes)]
    )


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, nbits: int = 16
) -> DataFrame:
    base = with_tokens(df, text_col)
    return base.select(
        F.col(id_col), simhash_bits_col("toks", nbits).alias("simhash_bits")
    )


def lsh_banded_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The stored form of a MinHash-LSH index: one (id, band_idx,
    band_hash) row per band per document. `lsh_candidate_pairs`
    self-joins it for a one-shot sweep; `lsh_pairs_delta` equi-joins a
    delta batch's index against it for incremental ingestion — in a
    production pipeline THIS is the frame you keep in the warehouse
    (bucketed on (band_idx, band_hash)) so nightly document batches
    dedup against the corpus without ever re-hashing it."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes)
    band_cols = [
        F.md5(
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh_{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    return (
        banded.select(
            F.col(id_col),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.col(f"band_{b}").alias("band_hash"),
                    )
                    for b in range(bands)
                ])
            ).alias("band"),
        )
        .select(id_col, "band.band_idx", "band.band_hash")
        # band_key = the SINGLE-COLUMN join key (band_idx has a fixed
        # ':'-free rendering and band_hash a fixed length, so the
        # concat decomposes uniquely — equi-joining on band_key IS the
        # (band_idx, band_hash) join). One key matters at the storage
        # layer: a table bucketed on band_key serves the incremental
        # probe exchange-free, where Spark will not satisfy a
        # composite-key join distribution from a single-key bucket
        # layout (measured: the two-key join shuffles BOTH sides).
        .withColumn(
            "band_key",
            F.concat_ws(":", F.col("band_idx"), F.col("band_hash")),
        )
    )


def lsh_pairs_delta(
    old_docs: DataFrame | None,
    delta_docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    old_index: DataFrame | None = None,
) -> DataFrame:
    """Insert-only incremental LSH dedup: the candidate pairs ADDED
    when a delta batch lands on an already-indexed corpus —
    (Δ ⋈ old index) ∪ (Δ ⋈ Δ), the old⋈old product never recomputed
    (the `join_view_delta` rule applied to the banded self-join,
    which is a join of the index with itself: pairs(old ∪ Δ) =
    pairs(old) ∪ pairs_delta because band-bucket candidacy is
    monotone under inserts). This is the shape continuous ingestion
    needs at 100 TB: per batch only the DELTA is shingled/hashed
    (delta-proportional work) when the caller passes `old_index` —
    the production path: a `lsh_banded_index` frame read back from
    the warehouse, bucketed on `band_key` so the probe leaves the
    corpus-sized index exchange-free (single-key bucket layouts do
    not satisfy composite-key join distributions, which is why the
    join rides band_key, not (band_idx, band_hash) — plan-pinned in
    tests). Passing `old_docs` instead hashes the old side in-line —
    the convenience path the oracle-gated corpus query uses so the
    full pipeline stays SQL-mirrorable from raw documents. The
    returned pair set is exactly what a full recompute would have
    added — proven by the corpus query's oracle, which re-derives
    the FULL banded self-join in SQL and keeps the pairs touching Δ.
    Deletes are out of scope by the same contract as
    `join_view_delta` (candidacy is not monotone under deletes).
    Pair orientation matches the one-shot sweep: id_a < id_b, and a
    re-ingested document (same id on both sides of the boundary)
    never pairs with itself."""
    if (old_docs is None) == (old_index is None):
        raise ValueError(
            "lsh_pairs_delta: pass exactly one of old_docs (in-line "
            "hash) or old_index (stored lsh_banded_index frame)"
        )
    if old_index is None:
        old_idx = track_persist(
            lsh_banded_index(old_docs, text_col, id_col, num_hashes, bands)
        )
    else:
        old_idx = old_index
    new_idx = track_persist(
        lsh_banded_index(delta_docs, text_col, id_col, num_hashes, bands)
    )
    a = new_idx.alias("a")
    cross = (
        a.join(
            old_idx.alias("b"),
            F.col("a.band_key") == F.col("b.band_key"),
        )
        .select(
            F.least(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias("id_a"),
            F.greatest(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    intra = (
        a.join(
            new_idx.alias("c"),
            (F.col("a.band_key") == F.col("c.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"c.{id_col}").alias("id_b"),
        )
    )
    return cross.unionByName(intra).distinct()


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing ≥1 identical band.

    Plan shape: signatures → explode to (doc, band_idx, band_hash) →
    self-equi-join on (band_idx, band_hash) → distinct (a < b) pairs.
    The only shuffles are the band-hash repartition — at 100 TB this is
    the standard near-dup sweep layout (each bucket is tiny; skewed
    buckets are split by AQE).
    """
    exploded = lsh_banded_index(df, text_col, id_col, num_hashes, bands)
    # both self-join sides branch from here — materialize the (tiny)
    # banded index once instead of recomputing signatures per side
    exploded = track_persist(exploded)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    k: int = SHINGLE_K,
    df_max: int | None = None,
) -> DataFrame:
    """Exact distinct-shingle Jaccard pairs within blocking groups,
    via an inverted shingle index (explode → equi-join on the shingle →
    per-pair overlap count), never a block-quadratic array_intersect.

    Plan shape: |intersection| comes from a groupBy over the shared-
    shingle equi-join, |union| from per-doc distinct-shingle sizes
    joined back in. Only pairs sharing ≥1 shingle materialize, so work
    is proportional to real overlap, and the shuffles are all on
    (block, shingle) / (id_a, id_b) keys — the layout that survives a
    100× scale-up. Moderately-hot shingles are split by AQE skew
    handling; truly viral ones need `df_max`:

    `df_max` is the document-frequency cap that keeps the index
    sub-quadratic at extreme scale: a boilerplate shingle shared by 1M
    docs ("all rights reserved...") would alone contribute 5·10^11
    join rows. With `df_max=n`, shingles occurring in more than n docs
    of a block are dropped from the index AND from the per-doc sizes,
    so the result is the EXACT Jaccard over the reduced (non-
    boilerplate) shingle universe — identical to the uncapped result
    whenever no shingle exceeds the cap, and a principled
    boilerplate-insensitive similarity when some do. The capped path
    switches to posting-list pair expansion (per-shingle sorted doc
    arrays, map-side i<j combos — no self-join) whose per-shingle
    work is bounded by df_max² by construction; dropped-shingle counts
    log at INFO only (the count is an extra pass — observability is
    opt-in, the operator never pays for it).
    """
    # persist the per-doc shingle sets: the self-join's two sides and
    # the size lookup all branch from this node, and without an explicit
    # materialization each branch re-runs the tokenize+shingle pipeline
    # (same reason you'd stage this table before a self-join on a
    # cluster; Spark's LRU evicts it when memory is needed).
    #
    # Shingle identity is a portable 60-bit md5-derived hash (15 hex
    # chars — fits BIGINT in every engine), not the ~45-char shingle
    # string: the index shuffle then moves 8-byte longs instead of
    # strings (measured at the 20x probe: the posting aggregation's
    # shuffle went from ~230 MB of strings to ~40 MB, the dominant
    # superlinear term). Sizes, postings, and intersection counts all
    # live consistently in hash space, so the Jaccard is exact over
    # hash identities; a collision merges two shingles with
    # probability C(S,2)/2^60 per block (~1e-8 at test SFs, ~4e5
    # expected merges per 10^12-shingle warehouse block — and flipping
    # any PAIR's threshold additionally requires both docs to straddle
    # the colliding duo). 32-bit hash64_expr is NOT enough here: ~7
    # expected collisions at sf0.1 would already drift counts.
    sh60 = (
        "transform(shingles, s -> "
        "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))"
    )
    d = with_shingles(df, text_col, k).withColumn(
        "sh_set", F.array_distinct(F.expr(sh60))
    ).select(id_col, *block_cols, "sh_set")
    d = track_persist(d)
    sizes = d.select(
        F.col(id_col), *block_cols, F.size("sh_set").alias("sh_n")
    )
    # explode_outer, not explode: plain explode makes Catalyst infer a
    # `size(sh_set) > 0` guard and push the whole shingle pipeline down
    # as a duplicate pre-filter (evaluated again, before the scan's
    # repartition). Our shingle arrays are never empty, so the outer
    # variant is semantically identical and evaluates the pipeline once.
    inv = d.select(
        F.col(id_col), *block_cols, F.explode_outer("sh_set").alias("sh")
    )
    if df_max is not None:
        # posting-list form: ONE aggregation builds per-shingle sorted
        # doc lists, the cap is a size filter on the list, and pairs
        # expand MAP-SIDE from each list (every i<j combo — the same
        # array expansion as the market-basket operator) — no
        # self-join at all, and the per-shingle pair blowup is
        # explicitly bounded by df_max² by construction. The hot-list
        # sizes are logged opt-in (INFO) since that count is an extra
        # pass over the posting table.
        # the posting aggregation feeds BOTH the pair expansion (the
        # <= df_max lists) and the hot-shingle size correction (the
        # > df_max lists); without a materialization each branch
        # re-runs the explode + collect_list shuffle from the cached
        # shingle sets (r14, guide §2.4 — the capped bench row spent
        # half its time building the index twice)
        posting = track_persist(
            inv.groupBy(*block_cols, "sh")
            .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        )
        if _log.isEnabledFor(logging.INFO):
            n_hot = posting.filter(F.size("ids") > df_max).count()
            _log.info(
                "shingle_jaccard_pairs: df_max=%d drops %d hot shingles",
                df_max,
                n_hot,
            )
        hot = posting.filter(F.size("ids") > df_max)
        posting = posting.filter(F.size("ids") <= df_max)
        overlap = (
            posting.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids) - i - 1), "
                        "y -> struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        # per-doc sizes over the REDUCED (capped) universe WITHOUT an
        # index-sized re-aggregation: subtract each doc's hot-shingle
        # membership count from its map-side base size. The correction
        # frame only contains docs that appear in a hot posting list —
        # empty when nothing exceeds the cap, and doc-bounded (never
        # index-bounded) when something does; AQE broadcasts it when
        # small.
        hot_per_doc = (
            hot.select(*block_cols, F.explode("ids").alias(id_col))
            .groupBy(id_col, *block_cols)
            .agg(F.count(F.lit(1)).alias("__hot_cnt"))
        )
        sizes = (
            sizes.join(hot_per_doc, [id_col, *block_cols], "left")
            .select(
                F.col(id_col),
                *block_cols,
                (F.col("sh_n") - F.coalesce("__hot_cnt", F.lit(0))).alias("sh_n"),
            )
        )
    else:
        a, b = inv.alias("a"), inv.alias("b")
        cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
            F.col("a.sh") == F.col("b.sh")
        )
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        overlap = (
            a.join(b, cond)
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sh_n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sh_n").alias("n_b"))
    inter = F.col("inter")
    union = F.col("n_a") + F.col("n_b") - inter
    # threshold as an exact integer predicate (inter/union >= t), so the
    # result set is bit-identical across engines
    num, den = round(threshold * 100), 100
    return (
        overlap.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(inter * den >= union * num)
        .select("id_a", "id_b", round_div(inter, union, "jaccard", 4))
    )
