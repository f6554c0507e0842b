"""Deduplication operators for large-scale training-data pipelines.

The reference dedups by deterministic content identity (UUID insert-or-
replace, juris.ts:9-13) — i.e. exact dedup.  At 100 TB a corpus also needs
NEAR-duplicate removal; these operators add the standard family, each
expressed Spark-first:

* exact        — hash-groupBy on sha2(content)           (one shuffle)
* minhash LSH  — shingle → minhash → band → bucket-join  (JVM expressions
                 end-to-end: xxhash64 as the hash family, no Python)
* simhash      — 64-bit sign-aggregated token hashes     (JVM expressions)
* n-gram Jaccard — exploded-shingle self-join            (SQL-expressible)
* embedding cosine near-dup — see similarity.py

Scale notes: every operator here shuffles on content-derived keys
(hash/shingle/band), which are uniformly distributed by construction — no
hot-key salting needed.  The shingle explode in the Jaccard path multiplies
rows by ~n_tokens; at 100 TB you bound it by first applying minhash-LSH
banding (candidates only) and verifying Jaccard on the candidate pairs, which
is exactly how ``minhash_lsh_candidates`` + ``verify_jaccard`` compose.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — pure JVM expressions."""
    t = tokens(col)
    k = F.size(t) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(t, " ")))  # short doc → single shingle


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact content hash.

    groupBy on sha2 gets map-side partial aggregation; the shuffle moves one
    row per distinct hash, not per row.
    """
    h = F.sha2(F.col(text_col), 256).alias("_h")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(col: Column | str, num_hashes: int = 32, seed: int = 42) -> Column:
    """array<bigint> of ``num_hashes`` minhash values.

    Hash family: xxhash64(shingle, seed, k) — k independent permutations via
    salt, all JVM-side.  min over the shingle set per k.
    """
    sh = shingles(col)

    # NB: a plain `lambda s, k=k: ...` would have arity 2, making PySpark
    # bind k to the array-index column — a real closure is required.
    def _minhash_k(k: int) -> Column:
        def h(s: Column) -> Column:
            return F.xxhash64(s, F.lit(seed), F.lit(k))

        return F.array_min(F.transform(sh, h))

    return F.array(*[_minhash_k(k) for k in range(num_hashes)])


def minhash_signature_pandas(
    col: Column | str, num_hashes: int = 32, seed: int = 42, n: int = 3
) -> Column:
    """Arrow-vectorized minhash signature (the scale path).

    Spark higher-order functions are interpreted, not codegen'd, so the
    expression form above costs ~num_hashes interpreted passes per row.
    Here one pandas UDF computes the whole signature with NO per-shingle
    Python work: every token of the Arrow batch is hashed in ONE C pass
    (``pd.util.hash_array`` — SipHash with pandas' fixed default key, so
    deterministic across processes/executors), shingle hashes are a
    vectorized polynomial over ``n`` consecutive token hashes computed
    batch-wide on the flat token-hash array, and the k multiply-add
    permutations a_k*h+b_k (mod 2^64, a_k odd) are one numpy broadcast per
    doc.  A shingle's hash depends only on its n tokens, so equal shingle
    SETS still yield equal signatures (the property the threshold-1.0
    lossless prefilter relies on); the hash family itself differs from the
    JVM ``impl="expr"`` form — pick one impl per table.
    """
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    # deterministic odd multipliers / offsets from the seed (splitmix-style)
    def _params(k: int) -> tuple[np.ndarray, np.ndarray]:
        xs = []
        x = np.uint64(seed * 0x9E3779B97F4A7C15 % (1 << 64) or 1)
        for _ in range(2 * k):
            x = np.uint64((int(x) * 6364136223846793005 + 1442695040888963407) % (1 << 64))
            xs.append(int(x))
        a = np.array([v | 1 for v in xs[:k]], dtype=np.uint64)
        b = np.array(xs[k:], dtype=np.uint64)
        return a, b

    A, B = _params(num_hashes)
    P = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio polynomial base
    EMPTY = np.uint64((seed * 0xD6E8FEB86659FD93 + 1) % (1 << 64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        old = np.seterr(over="ignore")
        docs = [(t or "").lower().split() for t in texts]
        counts = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
        flat = [w for d in docs for w in d]
        th = (
            pd.util.hash_array(np.asarray(flat, dtype=object), categorize=False).astype(
                np.uint64
            )
            if flat
            else np.empty(0, dtype=np.uint64)
        )
        # window the flat token-hash array once for the whole batch; windows
        # straddling a doc boundary are simply never selected below
        L = len(th)
        if L >= n:
            win = th[: L - n + 1].copy()
            for j in range(1, n):
                win = win * P + th[j : L - n + 1 + j]
        else:
            win = np.empty(0, dtype=np.uint64)
        ends = np.cumsum(counts)
        starts = ends - counts
        out = []
        for i in range(len(docs)):
            m = counts[i]
            if m >= n:
                hs = win[starts[i] : ends[i] - n + 1]
            else:
                # short doc: ONE shingle over all its tokens (old semantics)
                acc = EMPTY
                for v in th[starts[i] : ends[i]]:
                    acc = acc * P + v
                hs = np.array([acc], dtype=np.uint64)
            sig_vals = (A[:, None] * hs[None, :] + B[:, None]).min(axis=1)
            out.append(sig_vals.astype(np.int64).tolist())
        np.seterr(**old)
        return pd.Series(out)

    return sig(F.col(col) if isinstance(col, str) else col)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    impl: str = "pandas",  # "pandas" (vectorized, default) | "expr" (pure JVM)
    with_est: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded LSH.

    rows-per-band = num_hashes/bands; two docs collide when ANY band's
    signature slice matches exactly.  The band bucket join is an equi-join on
    (band, band_hash) — shuffle keys are uniform hashes, broadcast-free and
    skew-free by construction.

    ``with_est=True`` adds an ``est_jaccard`` column (fraction of equal
    signature components — the standard unbiased minhash Jaccard estimator).
    The signatures ride THROUGH the band explode for it, so both self-join
    sides stay the identical subtree (one ReusedExchange, the signature UDF
    does not re-run) and the estimate costs one 32-element compare per
    candidate pair instead of extra joins.
    """
    r = num_hashes // bands
    mk = minhash_signature_pandas if impl == "pandas" else minhash_signature
    sig = df.select(F.col(id_col), mk(text_col, num_hashes, seed).alias("_sig"))
    keep = [id_col, "_sig"] if with_est else [id_col]
    # band key = xxhash64 of the signature SLICE (Spark's hash functions
    # accept arrays) via one transform lambda — the per-band unrolled
    # element_at/concat_ws projection this replaces compiled to a codegen
    # unit that cost ~1s of driver janino time on first run
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.xxhash64(F.slice("_sig", b * r + 1, r)).alias("bh"),
        ),
    )
    banded = sig.select(*keep, F.explode(band_keys).alias("bk")).select(
        *keep, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    # shuffle-hash hint, twofold: (1) scale — AQE would happily BROADCAST
    # the banded corpus as the build side at sandbox sizes, a plan that is
    # impossible at 100 TB (the build side IS the corpus ×bands); the hint
    # pins the physical join both sizes agree on.  (2) reuse — with both
    # sides shuffling on identical (band, bh) exchanges over the identical
    # subtree, the signature UDF computes ONCE and the second side is a
    # ReusedExchange; the broadcast plan re-evaluated it per side.
    a = banded.alias("a")
    b = banded.hint("shuffle_hash").alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    if with_est:
        eq = F.zip_with(
            F.col("a._sig"), F.col("b._sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        )
        est = (
            F.aggregate(eq, F.lit(0), lambda acc, v: acc + v).cast("double")
            / F.lit(float(num_hashes))
        )
        return joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            est.alias("est_jaccard"),
        ).distinct()
    return joined.select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    ).distinct()


def verify_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs (the LSH verify stage)."""
    sh = df.select(F.col(id_col), F.array_distinct(shingles(text_col)).alias("_sh"))
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        j.withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def verify_jaccard_pandas(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs, Arrow-vectorized.

    The expr form (verify_jaccard) materializes shingle arrays for EVERY
    document via interpreted higher-order functions; here only candidate
    pairs join to their raw TEXT (smaller than its shingle set) and one
    pandas UDF computes exact Jaccard per pair — same tokenizer as the
    signature UDF.  Union is never 0 (an empty doc shingles to {''}), so no
    NULL/NaN ordering trap."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def jac(xs: pd.Series, ys: pd.Series) -> pd.Series:
        def sh(t):
            toks = [w for w in (t or "").lower().split() if w]
            if len(toks) >= n:
                return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            return {" ".join(toks)}

        out = []
        for x, y in zip(xs, ys):
            a, b = sh(x), sh(y)
            inter = len(a & b)
            out.append(inter / (len(a) + len(b) - inter))
        return pd.Series(out)

    ta = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", jac("_ta", "_tb"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    est_margin: float | None = None,
    verify_impl: str = "expr",  # "expr" (HOF arrays) | "pandas" (Arrow batch)
) -> DataFrame:
    """Drop near-duplicates: keep the min-id representative of each verified
    near-dup pair's component (greedy: drop id_b of every confirmed pair).

    ``est_margin`` enables a signature-estimate prefilter: candidates with
    est_jaccard < threshold - est_margin skip the exact verify.  At
    threshold 1.0 with margin 0.0 this is LOSSLESS (identical shingle sets
    ⟹ identical signatures ⟹ est exactly 1.0); at lower thresholds it is an
    approximation (a true pair can estimate low), so it stays opt-in."""
    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, seed, with_est=est_margin is not None
    )
    if est_margin is not None:
        cand = cand.where(F.col("est_jaccard") >= threshold - est_margin).select(
            "id_a", "id_b"
        )
    verify = verify_jaccard_pandas if verify_impl == "pandas" else verify_jaccard
    dups = verify(cand, df, text_col, id_col, threshold).select(
        F.col("id_b").alias(id_col)
    ).distinct()
    return df.join(dups, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(col: Column | str, seed: int = 42) -> Column:
    """64-bit simhash as bigint, pure JVM expressions.

    For each bit position, sum +1/-1 over token hashes and take the sign.
    Implemented as 64 aggregate folds compiled into one projection —
    heavy-looking but codegen'd, and stays out of Python entirely.
    """
    t = tokens(col)
    hashes = F.transform(t, lambda x: F.xxhash64(x, F.lit(seed)))

    def _vote(b: int) -> Column:
        def step(acc: Column, h: Column) -> Column:
            return acc + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

        return F.aggregate(hashes, F.lit(0).cast("long"), step)

    bits = []
    for b in range(64):
        vote = _vote(b)
        bits.append(F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for x in bits[1:]:
        out = out.bitwiseOR(x)
    return out


def simhash_pandas(col: Column | str, seed: int = 42) -> Column:
    """Arrow-vectorized 64-bit simhash (the scale path).

    The expression form above folds 64 interpreted higher-order ``aggregate``
    lambdas per row (HOFs are not codegen'd in practice — see the minhash
    note); here one pandas UDF hashes each token once (blake2b, deterministic
    across processes) and computes all 64 bit votes as a single numpy
    broadcast: bits[(n_tokens, 64)] → sign of the ±1 column sums.

    Hash family differs from the JVM form (blake2b vs xxhash64), so
    signatures are not bit-identical across ``impl=`` — near-dup SEMANTICS
    are equivalent and property-tested; pick one impl per table.
    """
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def sig(texts: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        pow2 = (np.uint64(1) << shifts).astype(np.uint64)
        docs = [(t or "").lower().split() for t in texts]
        counts = np.fromiter((len(d) for d in docs), dtype=np.int64, count=len(docs))
        flat = [w for d in docs for w in d]
        out = np.zeros(len(texts), dtype=np.int64)  # empty doc → 0
        if flat:
            # ONE C-level hash pass for the whole Arrow batch (SipHash via
            # pd.util.hash_array, keyed on the seed → deterministic across
            # executors), then all 64 bit votes for all docs via reduceat.
            hs = pd.util.hash_array(
                np.asarray(flat, dtype=object),
                categorize=False,
                hash_key=f"{seed & 0xFFFFFFFFFFFFFFFF:016x}",
            ).astype(np.uint64)
            nonempty = np.nonzero(counts > 0)[0]
            starts = np.cumsum(counts) - counts
            # one bit-column at a time: a full (total_tokens, 64) int64 bits
            # matrix is 512 B/token (~5 GB for a 10k-doc batch of 1k-token
            # documents); the per-bit temp is 8 B/token, same O(work)
            sums = np.empty((len(nonempty), 64), dtype=np.int64)
            seg = starts[nonempty]
            for s in range(64):
                col = ((hs >> np.uint64(s)) & np.uint64(1)).astype(np.int64)
                sums[:, s] = np.add.reduceat(col, seg)
            votes = 2 * sums - counts[nonempty, None]
            words = ((votes > 0).astype(np.uint64) * pow2[None, :]).sum(axis=1)
            out[nonempty] = words.astype(np.int64)
        return pd.Series(out)

    return sig(F.col(col) if isinstance(col, str) else col)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures: bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 16,
    seed: int = 42,
    impl: str = "pandas",  # "pandas" (Arrow-vectorized, default) | "expr" (pure JVM)
) -> DataFrame:
    """Near-dup removal by simhash: band the 64-bit signature into 4×16-bit
    chunks (pigeonhole: ≤3 differing bits → at least one identical chunk),
    bucket-join on chunks, verify full hamming distance."""
    n_bands = 64 // band_bits
    mk = simhash_pandas if impl == "pandas" else simhash
    sig = df.select(F.col(id_col), mk(text_col, seed).alias("_sim"))
    mask = (1 << band_bits) - 1
    banded = sig.select(
        id_col,
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("_sim", b * band_bits).bitwiseAND(F.lit(mask)).alias("chunk"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "_sim", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    # shuffle_hash for the same two reasons as minhash_lsh_candidates:
    # never broadcast a corpus-sized build side, and let both sides share
    # one exchange so the signature UDF computes once
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    dup_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(hamming64(F.col("a._sim"), F.col("b._sim")) <= max_hamming)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return df.join(dup_ids, id_col, "left_anti")


# ---------------------------------------------------------------------------
# n-gram Jaccard (all-pairs, SQL-expressible — the DuckDB-oracle-friendly path)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with shingle-Jaccard ≥ threshold via exploded shingle
    self-join — no LSH, exact; quadratic in the worst case, so at scale use
    minhash_lsh_candidates + verify_jaccard instead."""
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, n))).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("common").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
