"""Deterministic sampling & splitting for training-data pipelines
(SURVEY §2.6 X-ops family).

`df.sample()` is seed-dependent on partitioning and `sampleBy` is
row-order sensitive — neither is reproducible across engines or
re-partitions, which breaks dataset versioning. These ops decide
membership from the ROW ID alone via multiplicative hashing (Knuth's
2654435761 over 2^32) in pure integer arithmetic, so:

- the same row always lands in the same sample/split, regardless of
  partitioning, cluster size, or engine (any SQL engine reproduces
  the expression bit-for-bit — oracle-checkable);
- sampling composes with incremental data: new rows don't reshuffle
  old membership (critical for frozen eval sets);
- no shuffle at all — membership is a projection + filter, pushed
  into the scan.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)
_MOD = 4294967296  # 2^32


def hash01(id_col: str | Column, salt: int = 0) -> Column:
    """Deterministic uniform-ish value in [0, 1) from an integer id.

    The id is reduced mod 2^31-1 BEFORE the 2^31.3 multiplier so no
    intermediate exceeds 2^63: a raw multiply overflows signed 64-bit
    for ids >= ~3.5e9 (e.g. every monotonically_increasing_id beyond
    partition 0) — a hard ARITHMETIC_OVERFLOW under Spark's default
    ANSI mode, and a broken bit-for-bit oracle contract on engines
    that error on BIGINT overflow. Membership is unchanged for ids
    below 2^31-1 (the reduction is the identity there)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    c1 = F.pmod(c.cast("long") + F.lit(salt), F.lit(2147483647))
    return F.pmod(c1 * F.lit(KNUTH_MULT), F.lit(_MOD)) / F.lit(float(_MOD))


def hash_sample(df: DataFrame, id_col: str, fraction: float, salt: int = 0) -> DataFrame:
    """Keep ~fraction of rows, membership decided by id hash."""
    return df.where(hash01(id_col, salt) < F.lit(float(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum keep fractions (e.g. language rebalancing: keep 10%
    of English, 100% of low-resource languages)."""
    frac = F.lit(float(default_fraction))
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(frac)
    return df.where(hash01(id_col, salt) < frac)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    salt: int = 0,
) -> DataFrame:
    """Add a `split` column assigning each row to one partition of the
    dataset by hash — frozen under repartitioning and appends."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = float(sum(weights))
    h = hash01(id_col, salt)
    expr = F.lit(names[-1])
    cum = 0.0
    conds = []
    for w, name in zip(weights[:-1], names[:-1]):
        cum += w / total
        conds.append((cum, name))
    for cum_w, name in reversed(conds):
        expr = F.when(h < F.lit(cum_w), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def domain_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    target: Mapping[str, float] | None = None,
    salt: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """Rebalance a corpus across domains (source buckets) by
    deterministic downsampling — the data-mixing step of a pretraining
    pipeline. With no explicit `target`, every domain is downsampled
    to the size of the smallest one (uniform mix); with a target map
    {domain: weight}, acceptance scales so realized proportions track
    the weights as closely as downsampling-only allows.

    Shape: per-domain counts are a tiny groupBy aggregate (map-side
    combined), broadcast back onto the corpus — the corpus itself is
    never shuffled; membership is the same multiplicative id-hash as
    hash_sample, a pure projection+filter the scan can stream through,
    so the op is one broadcast join at any scale and membership is
    frozen under repartitioning.

    ``weight_col`` switches the balancing quantity from rows to a
    per-row weight (pass a token-count column to mix by TOKENS — the
    quantity a training run actually budgets; long-document domains
    then downsample harder than their row share suggests). Acceptance
    stays per-row, so realized weighted proportions track the target
    in expectation.
    """
    size = F.sum(F.col(weight_col)) if weight_col else F.count("*")
    counts = df.groupBy(F.col(domain_col).alias("__dom")).agg(
        size.alias("__cnt")
    )
    if target is None:
        floor = counts.agg(F.min("__cnt").alias("__floor"))
        rates = counts.crossJoin(F.broadcast(floor)).select(
            "__dom", (F.col("__floor") / F.col("__cnt")).alias("__rate")
        )
    else:
        # scale so the most-constrained domain keeps 100% of its rows:
        # rate_d = (w_d / cnt_d) / max_d'(w_d' / cnt_d'), capped at 1
        w = F.lit(0.0)
        for dom, wt in target.items():
            w = F.when(F.col("__dom") == F.lit(dom), F.lit(float(wt))).otherwise(w)
        scored = counts.select("__dom", "__cnt", (w / F.col("__cnt")).alias("__wpc"))
        peak = scored.agg(F.max("__wpc").alias("__peak"))
        rates = scored.crossJoin(F.broadcast(peak)).select(
            "__dom", F.least(F.col("__wpc") / F.col("__peak"), F.lit(1.0)).alias("__rate")
        )
    return (
        df.join(F.broadcast(rates), df[domain_col] == F.col("__dom"))
        .where(hash01(id_col, salt) < F.col("__rate"))
        .drop("__dom", "__rate")
    )


# second-round multiplier (< 2^31 so the mix below never overflows a
# signed 64-bit intermediate in either engine)
_K2 = 1327217885
_MERSENNE31 = 2147483647  # 2^31 - 1


def shuffle_key(id_col: str | Column, epoch: int = 0) -> Column:
    """Deterministic per-epoch shuffle key for training-order
    randomization. Two hash rounds with an xor-shift mix between them:
    a single multiplicative hash with an additive epoch salt would
    make epoch e+1's order a near-rotation of epoch e's (adding a
    constant mod M only reorders at the wrap point); the mix breaks
    that structure so epochs are independent-looking permutations.

    All intermediates stay below 2^63 (first operand reduced mod
    2^31-1 before the 2^31.3 multiplier; second multiplier < 2^31), so
    the same expression runs overflow-free on Spark AND any BIGINT SQL
    engine — the oracle reproduces it bit-for-bit.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    c1 = F.pmod(c.cast("long") + F.lit(epoch * 1000003), F.lit(_MERSENNE31))
    h1 = F.pmod(c1 * F.lit(KNUTH_MULT), F.lit(_MOD))
    mixed = h1.bitwiseXOR(F.shiftright(h1, 16))
    return F.pmod(mixed * F.lit(_K2), F.lit(_MOD)).cast("long")


def epoch_shuffle(df: DataFrame, id_col: str, epoch: int = 0) -> DataFrame:
    """Global deterministic shuffle of a corpus for one training epoch:
    appends `shuffle_key` and returns the frame ordered by (key, id).

    The sort is Spark's distributed range-partitioned sort (sampled
    boundaries, no single-task funnel), which a writer preserves with
    a partitioned write — this is how you lay out 100 TB in a
    reproducible random order without ever collecting anything. The
    id tiebreak makes the order total even across key collisions.
    """
    return df.withColumn("shuffle_key", shuffle_key(id_col, epoch)).orderBy(
        "shuffle_key", id_col
    )


def with_global_position(
    df: DataFrame,
    order_by: str | Sequence[str],
    pos_col: str = "position",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row its 0-based global position in the total order
    `order_by` — the "write a training index" step after epoch_shuffle.

    The naive rendering, ``row_number() OVER (ORDER BY …)``, collapses
    the whole dataset into ONE window task; this is the distributed
    form: range-repartition on the order keys (sampled boundaries →
    balanced partitions, globally ordered BY CONSTRUCTION), then a
    per-partition local index (Arrow mapInPandas streaming pass —
    partition-preserving, NO second full-data shuffle; a
    Window.partitionBy(partition_id) would hash-shuffle everything
    again) plus broadcast offsets from the tiny per-partition count
    aggregate. ONE full-data exchange total.

    The ranged frame is localCheckpoint'ed before fanning out to the
    counts branch and the output branch: range boundaries are SAMPLED,
    so two independent evaluations of the exchange can produce
    different partitionings — correctness must not depend on
    exchange-reuse kicking in (verified failure mode: with
    spark.sql.exchange.reuse=false, unpinned plans yield duplicate
    positions). The checkpoint pins one materialized partitioning
    that both branches read.

    `order_by` must be a TOTAL order (include a unique id as the last
    key) — with ties across a partition boundary the position of tied
    rows would depend on the sampled boundaries.
    """
    return with_global_cumsum(
        df, order_by, value_col=None, out_col=pos_col,
        num_partitions=num_partitions,
    )


def with_global_cumsum(
    df: DataFrame,
    order_by: str | Sequence[str],
    value_col: str | None = None,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global prefix sum of ``value_col`` (row count when
    None) in the total order `order_by` — the primitive behind global
    row positions and token-stream offsets.

    Distributed shape (same argument as with_global_position's
    docstring): one range exchange, an Arrow mapInPandas local prefix
    pass (partition-preserving — no second full-data shuffle), and
    broadcast per-partition totals. The ranged frame is
    localCheckpoint'ed so both consumers read ONE materialized
    partitioning (sampled range boundaries must not be re-evaluated).
    """
    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    cols = [F.col(k) for k in keys]
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartitionByRange(int(parts), *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ranged.schema.fields) + [StructField("__local", LongType())]
    )

    def _prefix(batches):
        import pandas as pd

        run = 0
        for pdf in batches:
            pdf = pdf.copy()
            v = (
                pdf[value_col].fillna(0).astype("int64")
                if value_col
                else pd.Series(1, index=pdf.index, dtype="int64")
            )
            pdf["__local"] = (v.cumsum() - v + run).astype("int64")
            run += int(v.sum())
            yield pdf

    prefixed = ranged.mapInPandas(_prefix, out_schema)

    val = F.coalesce(F.col(value_col).cast("long"), F.lit(0)) if value_col else F.lit(1)
    totals = ranged.groupBy("__pid").agg(F.sum(val).alias("__tot"))
    from pyspark.sql import Window as _W

    offsets = totals.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__tot").over(
                _W.orderBy("__pid").rowsBetween(_W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__pid", "__offset")
    return (
        prefixed.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__offset", "__local")
    )


def u01(id_col: str | Column, salt: int = 0) -> Column:
    """Deterministic uniform value in (0, 1] from an integer id — the
    overflow-safe multiplicative hash shifted off zero (ln(u) must be
    finite). Shared by es_key and dsir_sample so the determinism
    contract has exactly one rendering."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    c1 = F.pmod(c.cast("long") + F.lit(salt), F.lit(_MERSENNE31))
    m = F.pmod(c1 * F.lit(KNUTH_MULT), F.lit(_MOD))
    return (m.cast("double") + F.lit(1.0)) / F.lit(float(_MOD + 1))


def es_key(id_col: str | Column, weight_col: str | Column, salt: int = 0) -> Column:
    """Efraimidis–Spirakis priority for weighted sampling WITHOUT
    replacement: key = ln(u) / w with u deterministic in (0, 1] from
    the row id — the log form of u^(1/w) (same order, no pow
    underflow for tiny weights). Rows ranked by key DESCENDING are a
    weighted sample: P(row i in top-k) follows the A-Res race of
    Efraimidis & Spirakis (IPL 2006).

    u uses the same overflow-safe multiplicative hash as hash01 but
    shifted to (0, 1] — u = 0 would put ln at -inf and make the row's
    selection undefined under IEEE comparisons. Every term is exact
    integer arithmetic until the final divide, so any BIGINT+DOUBLE
    engine reproduces the key (oracle-checkable; only sub-ulp libm
    differences in ln() could ever flip a boundary row)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return F.log(u01(id_col, salt)) / w.cast("double")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
    prefilter: bool | None = None,
) -> DataFrame:
    """Deterministic weighted sample of k rows WITHOUT replacement
    (Efraimidis–Spirakis A-Res): quality- or token-weighted corpus
    subsampling where a doc with twice the weight is twice as likely
    to survive — the selection step of a "keep the best 10B tokens"
    curation pass. Non-positive / NULL weights never selected.

    Deterministic in (id, salt) alone: the same rows win on any
    cluster size, partitioning, or engine — reruns and incremental
    appends don't reshuffle earlier picks, and the same arithmetic in
    plain SQL is the oracle.

    Scale shape: the naive rendering is a full sort — at 100 TB that
    is THE bottleneck. Here:
    - ``orderBy(key).limit(k)`` compiles to TakeOrderedAndProject
      (per-partition top-k heaps + single merge of k·P candidate
      rows, no global sort exchange) — right for the k ≤ ~100k that
      fits one collection point;
    - for larger k (> ~100k candidates at one collection point),
      ``prefilter`` (auto-enabled at k > 100_000, forceable either
      way) estimates the k-th key with approx_percentile on a
      conservative 2k/n quantile and filters map-side, so the top-k
      machinery only sees ~2k surviving rows instead of the corpus;
      if the sketch under-selects (< k survivors — bounded-error
      event), it falls back to the exact path. The keyed frame is
      persisted across the prefilter's extra passes (count /
      threshold / prune-count) so the source is scanned once, and
      selection is IDENTICAL either way — the threshold only prunes
      rows that cannot win.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    keyed = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__es_key", es_key(id_col, weight_col, salt))
    )
    if prefilter is None:
        prefilter = k > 100_000
    candidates = keyed
    if prefilter:
        from pyspark import StorageLevel

        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = keyed.count()
            candidates = keyed
            if n > 4 * k:
                # conservative threshold: aim at rank 2k so t-digest
                # error can't push the cut above the true k-th key
                q = 1.0 - min(1.0, (2.0 * k) / n)
                thr = keyed.agg(
                    F.expr(f"approx_percentile(__es_key, {q})").alias("t")
                ).collect()[0]["t"]
                pruned = keyed.where(F.col("__es_key") >= F.lit(float(thr)))
                if pruned.count() >= k:
                    candidates = pruned
            return (
                candidates.orderBy(F.col("__es_key").desc(), F.col(id_col))
                .limit(int(k))
                .drop("__es_key")
                .localCheckpoint()  # materialize before unpersist
            )
        finally:
            keyed.unpersist()
    return (
        candidates.orderBy(F.col("__es_key").desc(), F.col(id_col))
        .limit(int(k))
        .drop("__es_key")
    )


def _hashed_gram_buckets(text_col: Column, n_buckets: int) -> Column:
    """Hashed bag-of-ngrams features (unigrams + bigrams of lowercase
    whitespace words) as bucket ids. The bucket hash is the first 8
    md5 hex digits — reproducible in any engine with md5 + hex
    parsing, so importance weights are oracle-checkable bit-for-bit
    (xxhash64 would be Spark-only)."""
    words = F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != "")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(words, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_df: DataFrame,
    target_text_col: str | None = None,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every corpus document by how
    much more likely its hashed-ngram bag is under the TARGET
    distribution (e.g. a trusted/high-quality corpus) than under the
    raw corpus itself — log w(x) = Σ_b c_b(x)·(log p̂_target(b) −
    log p̂_source(b)) with add-α smoothing over `n_buckets` hashed
    unigram+bigram features.

    Output: (id, n_grams, dsir_logweight); docs with no grams get
    weight 0. Shape at scale: both distributions are n_buckets-sized
    aggregates (broadcast), the corpus explodes once into gram
    buckets and joins map-side — no corpus shuffle beyond the per-doc
    sum's partial aggregation.
    """
    t_col = target_text_col or text_col
    B = int(n_buckets)

    def bucket_counts(frame: DataFrame, col: str) -> DataFrame:
        return (
            frame.select(
                F.explode(_hashed_gram_buckets(F.col(col), B)).alias("b")
            )
            .groupBy("b")
            .agg(F.count("*").alias("c"))
        )

    tgt = bucket_counts(target_df, t_col)
    src = bucket_counts(df, text_col)
    # gram totals are the sums of the bucket aggregates — never
    # re-scan/re-explode the corpora for them (the count frames are
    # n_buckets-sized)
    t_tot = float(tgt.agg(F.sum("c")).collect()[0][0] or 0)
    s_tot = float(src.agg(F.sum("c")).collect()[0][0] or 0)
    a = float(alpha)
    ratio = (
        tgt.withColumnRenamed("c", "ct")
        .join(src.withColumnRenamed("c", "cs"), ["b"], "full")
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(a))
                    / F.lit(t_tot + a * B)
                )
                - F.log(
                    (F.coalesce(F.col("cs"), F.lit(0)) + F.lit(a))
                    / F.lit(s_tot + a * B)
                )
            ).alias("lr"),
        )
    )
    doc_buckets = df.select(
        F.col(id_col),
        F.explode(_hashed_gram_buckets(F.col(text_col), B)).alias("b"),
    )
    per_doc = (
        doc_buckets.join(F.broadcast(ratio), ["b"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            # unmatched buckets (neither corpus saw them — impossible
            # for source-built buckets, but belt) contribute 0
            F.sum(F.coalesce(F.col("lr"), F.lit(0.0))).alias("dsir_logweight"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("dsir_logweight"), F.lit(0.0)).alias("dsir_logweight"),
        )
    )


def dsir_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_df: DataFrame,
    k: int,
    target_text_col: str | None = None,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """DSIR selection: draw k docs without replacement with
    probability ∝ exp(dsir_logweight) via the deterministic
    Gumbel-max race — key = ln(−ln u) − logweight (u from the id
    hash), smallest k win. Everything stays in log space so extreme
    weights can't overflow, and the draw is frozen under
    repartitioning/engines like weighted_sample's. The top-k is
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    weights = dsir_weights(
        df, id_col, text_col, target_df, target_text_col, n_buckets, alpha
    )
    c = F.col(id_col)
    keyed = weights.withColumn(
        "__gumbel_key",
        F.log(-F.log(u01(id_col, salt))) - F.col("dsir_logweight"),
    )
    return (
        keyed.orderBy(F.col("__gumbel_key").asc(), c.asc())
        .limit(int(k))
        .drop("__gumbel_key")
    )


def interleave_domains(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic domain-interleaved training order: rows are
    striped round-robin across domains (rank-within-domain first,
    then domain, then the epoch-shuffle key) so consecutive training
    batches never clump on one source — the anti-correlation
    complement of epoch_shuffle, which randomizes globally but can
    still run long single-domain stretches when one domain dominates.

    Within each domain the order is the deterministic epoch shuffle,
    so different epochs stripe different documents while the striping
    structure (and engine-reproducibility) is preserved.

    Output: input columns + `interleave_rank` (0-based total order).
    Shape: one window shuffle on domain for the within-domain rank,
    then the global rank comes from with_global_position's range
    sort — NEVER a bare row_number() OVER (ORDER BY …) single-task
    funnel (the same discipline as x33)."""
    from pyspark.sql import Window

    key = shuffle_key(id_col, epoch)
    w = Window.partitionBy(domain_col).orderBy(key, F.col(id_col))
    ranked = df.withColumn("__dr", F.row_number().over(w))
    positioned = with_global_position(
        ranked, order_by=["__dr", domain_col, id_col],
        pos_col="interleave_rank",
    )
    return positioned.drop("__dr")


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weight_col: str,
    k_per_group: int,
    salt: int = 0,
) -> DataFrame:
    """Per-group weighted sampling without replacement: an
    Efraimidis–Spirakis draw of up to ``k_per_group`` rows inside
    EVERY group — the "quality-weighted budget per domain/language"
    curation step (global weighted_sample would let big domains eat
    the whole budget). Same deterministic ln(u)/w priorities, so the
    winners are frozen under repartitioning/appends/engines.

    Shape at scale: ONE window shuffle on the group key (rank over
    the ES priority) + filter — no per-group sorts beyond the window's
    partition-local ordering, no driver involvement at any group
    count. Skewed giant groups are the usual window caveat; AQE
    skew-split applies. Non-positive/NULL weights never selected.

    Output: input columns + `group_rank` (1-based within group)."""
    from pyspark.sql import Window

    if k_per_group <= 0:
        raise ValueError("k_per_group must be positive")
    keyed = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__es_key", es_key(id_col, weight_col, salt))
    w = Window.partitionBy(group_col).orderBy(
        F.col("__es_key").desc(), F.col(id_col)
    )
    return (
        keyed.withColumn("group_rank", F.row_number().over(w))
        .where(F.col("group_rank") <= k_per_group)
        .drop("__es_key")
    )
