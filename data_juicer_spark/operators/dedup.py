"""Deduplicators — exact hash, MinHash-LSH (shuffle-native, no actor
state), SimHash, n-gram Jaccard.

Scale design (the reference's distributed story is BTS union-find over
Ray actors, ray_bts_minhash_deduplicator.py:57-238; ours is pure
shuffle): minhash signatures via numpy pandas UDF → band explode →
groupBy(band) edge extraction (uid → min uid per bucket = star edges)
→ iterative min-label propagation (converges in O(cluster diameter),
shallow for LSH stars; each round localCheckpoint'ed to cut lineage)
→ keep min-uid row per component. Every step is a plain DataFrame
shuffle, so AQE handles skewed buckets and the job scales by cores.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from data_juicer_spark.operators.base import Deduplicator
from data_juicer_spark.registry import OPERATORS

MERSENNE_PRIME = np.uint64((1 << 61) - 1)
MAX_HASH = np.uint64((1 << 32) - 1)


def sha1_hash32(data: bytes) -> int:
    """32-bit sha1 (document_minhash_deduplicator.py:33-44, from datasketch)."""
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def optimal_param(threshold: float, num_perm: int,
                  fp_weight: float = 0.5, fn_weight: float = 0.5):
    """Optimal LSH (bands, rows) minimizing weighted FP+FN probability
    (document_minhash_deduplicator.py:47-96, from datasketch). Numerical
    integration via numpy trapezoid (no scipy dependency)."""

    def fp_prob(th, b, r):
        s = np.linspace(0.0, th, 512)
        return np.trapz(1 - (1 - s ** float(r)) ** float(b), s)

    def fn_prob(th, b, r):
        s = np.linspace(th, 1.0, 512)
        return np.trapz(1 - (1 - (1 - s ** float(r)) ** float(b)), s)

    min_error = float("inf")
    opt = (0, 0)
    for b in range(1, num_perm + 1):
        for r in range(1, num_perm // b + 1):
            err = fp_prob(threshold, b, r) * fp_weight + fn_prob(threshold, b, r) * fn_weight
            if err < min_error:
                min_error, opt = err, (b, r)
    return opt


def minhash_permutations(num_perm: int, seed: int = 42):
    """Identical permutation generation to the reference
    (document_minhash_deduplicator.py:207-217): RandomState(42) pairs."""
    gen = np.random.RandomState(seed=seed)
    pairs = np.array(
        [
            (
                gen.randint(1, MERSENNE_PRIME, dtype=np.uint64),
                gen.randint(0, MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T
    return pairs[0], pairs[1]


def _ignore_stripper(ignore_pattern):
    """Build the text-stripping callable for an ignore_pattern, or None.

    The reference compiles these with the `regex` module which supports
    \\p{...} unicode-property escapes; stdlib `re` raises
    re.error('bad escape \\p') — AT TASK TIME on every executor if left
    to the UDF. So: single-property patterns (\\p{P}, \\p{N}, \\p{Lu},
    and their \\P negations) are translated to unicodedata category
    checks here, any OTHER use of \\p/\\P raises ValueError at operator
    construction, and everything else compiles with re up front (bad
    regexes also fail here, driver-side)."""
    if not ignore_pattern:
        return None
    m = re.fullmatch(r"\\(p|P)\{([A-Za-z]{1,2})\}", ignore_pattern)
    if m:
        negate, prop = m.group(1) == "P", m.group(2)

        def strip_ignored(t, prop=prop, negate=negate):
            import unicodedata

            if len(prop) == 1:
                drop = lambda c: unicodedata.category(c)[0] == prop  # noqa: E731
            else:
                drop = lambda c: unicodedata.category(c) == prop  # noqa: E731
            if negate:
                return "".join(c for c in t if drop(c))
            return "".join(c for c in t if not drop(c))

        return strip_ignored
    if re.search(r"\\[pP]", ignore_pattern):
        raise ValueError(
            f"ignore_pattern {ignore_pattern!r}: unicode-property escapes "
            f"are only supported as a single \\p{{…}}/\\P{{…}} pattern "
            f"(stdlib re has no \\p; translate to explicit char classes "
            f"or use one property)")
    ign = re.compile(ignore_pattern)
    return lambda t: ign.sub("", t)


def _cap_stats_plan(counts: DataFrame, cap: int) -> DataFrame:
    """Lazy diagnostic plan over a candidate-group `count` frame: how
    many groups the size cap drops, and the largest group seen — read
    via op.cap_stats() (no-silent-caps principle). A plain Observation
    can't be used here: the counts node sits under a self-join, so it
    appears twice in the executed plan and Spark's observed-metrics
    collection rejects it. The stats plan is only executed when
    cap_stats() is called (one aggregate job, opt-in)."""
    return counts.agg(
        F.coalesce(F.sum((F.col("count") > cap).cast("long")),
                   F.lit(0)).alias("dropped_groups"),
        F.coalesce(F.max("count"), F.lit(0)).alias("largest_group"),
    )


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_rounds: int = 30) -> DataFrame:
    """Min-label propagation connected components over an edge DataFrame.

    Returns (node, component) with component = min node id in the
    component. Pure DataFrame iteration: each round every node adopts the
    min label among itself and its neighbors; converges in O(diameter)
    (LSH star edges → usually 2-4 rounds). localCheckpoint per round cuts
    the lineage so plans stay flat at scale.
    """
    sym = edges.selectExpr(f"{src} as a", f"{dst} as b").where("a <> b")
    sym = sym.union(sym.selectExpr("b as a", "a as b")).distinct()
    # checkpoint the (small: LSH candidate) edge set once — every round
    # joins against it, and the rounds must not re-resolve the whole
    # upstream signature/banding lineage. LAZY checkpoints throughout:
    # each round's convergence count is the action that materializes
    # that round's cache, so a round costs ONE job instead of the
    # eager-checkpoint-job + count-job pair (and sym/labels materialize
    # inside round 0's job instead of two standalone jobs) — same
    # lineage truncation, half the job choreography.
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=False)
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"], "inner")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=False)
        n_changed = new_labels.where("changed").count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels


@OPERATORS.register("document_deduplicator")
class DocumentDeduplicator(Deduplicator):
    """Exact dedup on md5(text) with lowercase / ignore-non-character
    options (document_deduplicator.py:30-107). Keep-first = min id_key per
    hash via a window — deterministic under shuffle (reference keeps the
    first row scanned; we key 'first' on the explicit order column)."""

    def __init__(self, lowercase: bool = False, ignore_non_character: bool = False,
                 id_key: Optional[str] = None, hash_method: str = "md5", **kw):
        super().__init__(**kw)
        if hash_method not in ("md5", "sha1", "sha256"):
            raise ValueError(f"unsupported hash_method {hash_method!r}")
        self.lowercase = lowercase
        self.ignore_non_character = ignore_non_character
        self.id_key = id_key
        self.hash_method = hash_method

    def hash_expr(self):
        # reference parity (document_deduplicator.py:43-66): optional
        # lowercase; ignore_non_character strips \s+|\d+|[ASCII punct]
        # (keeps all Unicode letters); the text is always strip()ped
        # before hashing. hash_method md5/sha1/sha256 mirrors
        # ray_document_deduplicator's method param.
        c = F.col(self.text_key)
        if self.lowercase:
            c = F.lower(c)
        if self.ignore_non_character:
            import re as _re
            import string as _string

            pat = r"\s+|\d+|[" + _re.escape(_string.punctuation) + "]"
            c = F.regexp_replace(c, pat, "")
        c = F.regexp_replace(c, r"^\s+|\s+$", "")
        if self.hash_method == "sha1":
            return F.sha1(c)
        if self.hash_method == "sha256":
            return F.sha2(c, 256)
        return F.md5(c)

    def apply(self, df: DataFrame) -> DataFrame:
        order_col = self.id_key or df.columns[0]
        w = Window.partitionBy("__dedup_hash__").orderBy(F.col(order_col).asc())
        return (
            df.withColumn("__dedup_hash__", self.hash_expr())
            .withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") == 1)
            .drop("__dedup_hash__", "__rn__")
        )


@OPERATORS.register("document_minhash_deduplicator")
class DocumentMinhashDeduplicator(Deduplicator):
    """MinHash-LSH near-dup removal, identical signature math to the
    reference (document_minhash_deduplicator.py:219-266: lowercase →
    shingle window w over space/char/punctuation tokens → sha1_hash32 →
    (a*h+b) % p & 0xffffffff min per perm; perms from RandomState(42)),
    but clustering is shuffle-native (see module docstring) instead of an
    in-memory UnionFind (…py:268-337)."""

    def __init__(self, tokenization: str = "space", window_size: int = 5,
                 num_permutations: int = 256, jaccard_threshold: float = 0.7,
                 num_bands: Optional[int] = None, num_rows_per_band: Optional[int] = None,
                 lowercase: bool = True, ignore_pattern: Optional[str] = None,
                 tokenizer_model: Optional[str] = None,
                 id_key: Optional[str] = None, **kw):
        if tokenizer_model is not None:
            raise NotImplementedError(
                "tokenizer_model (sentencepiece) is a model dep; use "
                "tokenization='space'/'char'/'punctuation' which are "
                "reference-bit-exact here")
        super().__init__(**kw)
        self.tokenization = tokenization
        self.window_size = window_size
        self.num_perm = num_permutations
        self.lowercase = lowercase
        self.ignore_pattern = ignore_pattern
        self._strip_ignored = _ignore_stripper(ignore_pattern)
        self.id_key = id_key
        if num_bands is None or num_rows_per_band is None:
            num_bands, num_rows_per_band = optimal_param(jaccard_threshold, num_permutations)
        self.num_bands = num_bands
        self.num_rows = num_rows_per_band
        self.perm_a, self.perm_b = minhash_permutations(num_permutations)

    def _minhash_udf(self):
        perm_a, perm_b = self.perm_a, self.perm_b
        num_perm = self.num_perm
        window = self.window_size
        tokenization = self.tokenization
        lowercase = self.lowercase
        # built (and validated) at __init__; \p{…} handled via
        # unicodedata translation — see _ignore_stripper
        strip_ignored = self._strip_ignored
        punct_re = re.compile(r"\W")

        @pandas_udf(ArrayType(LongType()))
        def minhash(s: pd.Series) -> pd.Series:
            # shingle hashing per row (sha1 parity with the reference),
            # then the permutation math batched across MANY rows per
            # numpy call: rows are packed into slabs of <=8192 shingles,
            # one (slab x num_perm) matrix multiply + minimum.reduceat
            # per slab instead of a tiny matmul per row
            row_hashes: list = []
            for text in s:
                text = text or ""
                if lowercase:
                    text = text.lower()
                if strip_ignored is not None:
                    text = strip_ignored(text)
                if tokenization == "character":
                    tokens = {
                        text[i : i + window].encode()
                        for i in range(len(text) - window + 1)
                    }
                elif tokenization == "regex_bpe":
                    # hermetic stand-in for the reference's sentencepiece
                    # mode (document_minhash_deduplicator.py:219-266):
                    # GPT2-style pretokenizer pieces as shingle tokens
                    toks = re.findall(
                        r"'(?:[sdmt]|ll|ve|re)| ?[^\W\d_]+| ?\d+| ?[^\w\s]+|\s+",
                        text)
                    tokens = {
                        " ".join(toks[i : i + window]).encode()
                        for i in range(len(toks) - window + 1)
                    }
                elif tokenization == "punctuation":
                    toks = punct_re.split(text)
                    tokens = {
                        " ".join(toks[i : i + window]).encode()
                        for i in range(len(toks) - window + 1)
                    }
                else:  # space
                    toks = [t for t in re.split(r"[ \n\t]", text) if t]
                    tokens = {
                        " ".join(toks[i : i + window]).encode()
                        for i in range(len(toks) - window + 1)
                    }
                if not tokens:
                    # no shingles → no dedup signal; excluded from banding
                    row_hashes.append(None)
                    continue
                row_hashes.append(np.fromiter(
                    (sha1_hash32(t) for t in tokens), dtype=np.uint64,
                    count=len(tokens),
                ))

            out: list = [None] * len(row_hashes)
            slab_rows: list = []
            slab_size = 0

            def flush():
                if not slab_rows:
                    return
                idxs, arrs = zip(*slab_rows)
                hv = np.concatenate(arrs)
                phv = np.bitwise_and(
                    (hv[:, None] * perm_a + perm_b) % MERSENNE_PRIME, MAX_HASH
                )
                starts = np.zeros(len(arrs), dtype=np.int64)
                np.cumsum([len(a) for a in arrs[:-1]], out=starts[1:])
                mins = np.minimum.reduceat(phv, starts, axis=0).astype(np.int64)
                for j, idx in enumerate(idxs):
                    out[idx] = mins[j].tolist()
                slab_rows.clear()

            for i, arr in enumerate(row_hashes):
                if arr is None:
                    continue
                slab_rows.append((i, arr))
                slab_size += len(arr)
                if slab_size >= 8192:
                    flush()
                    slab_size = 0
            flush()
            return pd.Series(out)

        return minhash

    def duplicate_pairs(self, df: DataFrame, order_col: str) -> DataFrame:
        """(src,dst) star edges: each LSH bucket of size>1 emits
        (member, min member)."""
        from data_juicer_spark.functions.partitioning import (
            ensure_scan_parallelism,
        )

        df = ensure_scan_parallelism(df)
        mh = self._minhash_udf()
        sig = df.select(
            F.col(order_col).alias("__uid__"),
            mh(F.col(self.text_key)).alias("__minhash__"),
        ).where(F.col("__minhash__").isNotNull())
        # signatures feed BOTH the bucket-minima agg and the join probe
        # below: a lazy localCheckpoint materializes the (n × num_perm)
        # signature table once instead of running the UDF pass twice
        sig = sig.localCheckpoint(eager=False)
        bands = sig.select(
            "__uid__",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {self.num_bands - 1}), "
                    f"b -> struct(b as band_id, "
                    f"slice(__minhash__, b * {self.num_rows} + 1, {self.num_rows}) as band_sig))"
                )
            ).alias("band"),
        ).select("__uid__", "band.band_id", F.col("band.band_sig").cast("array<long>").alias("band_sig"))
        # bucket minima via a fully map-side-combinable agg (min/count —
        # the shuffle carries one partial row per (task, bucket), not a
        # collect_list of every uid), then join the band rows back to the
        # (small: only buckets with n>1) minima — AQE broadcasts it when
        # tiny, falls back to a shuffle join when duplicates are massive
        mins = (
            bands.groupBy("band_id", "band_sig")
            .agg(F.min("__uid__").alias("dst"), F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .drop("n")
        )
        return (
            bands.join(mins, ["band_id", "band_sig"])
            .where(F.col("__uid__") != F.col("dst"))
            .select(F.col("__uid__").alias("src"), "dst")
            .distinct()
        )

    def apply(self, df: DataFrame) -> DataFrame:
        order_col = self.id_key or df.columns[0]
        edges = self.duplicate_pairs(df, order_col)
        comp = connected_components(edges)
        # drop rows that belong to a component but are not its min member
        losers = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("__loser__")
        )
        # plain left_anti: AQE broadcasts the loser set when it's small
        return df.join(losers, df[order_col] == F.col("__loser__"), "left_anti")


@OPERATORS.register("document_simhash_deduplicator")
class DocumentSimhashDeduplicator(Deduplicator):
    """SimHash dedup mirroring the reference's parameter surface and
    pipeline (document_simhash_deduplicator.py:42-237): tokenization ∈
    {space, punctuation, character} with ``window_size`` shingling
    (:112-133, duplicates weighted), optional lowercase/ignore_pattern,
    64-bit simhash = per-bit majority over shingle hashes, candidate
    pairs via block decomposition (hamming ≤ d ⇒ ≥ num_blocks−d
    identical blocks, so matching on ANY shared block is a recall-safe
    superset), exact Hamming verification ≤ ``hamming_distance``, BFS
    clustering (= connected components here), keep-first = min id
    (:203-219). Documented deviation: shingle hashes are md5[:8]
    (deterministic, hermetic) instead of simhash-pybind's unsigned_hash
    — the library isn't available in this environment; cluster goldens
    ported from the reference's unit test still reproduce because
    near-dup geometry depends on shared shingles, not the bit mixer.

    Scale guards (this engine, not the reference): exact-equal simhashes
    collapse via ONE groupBy before any join (mass duplicates never hit
    the pair join), the block self-join runs over DISTINCT simhash
    values only, and blocks bigger than ``max_block_size`` distinct
    values are dropped from candidate generation (capped like
    NgramJaccardDeduplicator.max_shingle_freq) so a hot block value
    cannot go quadratic."""

    def __init__(self, tokenization: str = "space", window_size: int = 6,
                 lowercase: bool = True, ignore_pattern: Optional[str] = None,
                 num_blocks: int = 6, hamming_distance: int = 4,
                 id_key: Optional[str] = None, max_block_size: int = 2000, **kw):
        super().__init__(**kw)
        if hamming_distance >= num_blocks:
            raise ValueError("hamming_distance must be < num_blocks")
        self.tokenization = tokenization
        self.window = window_size
        self.lowercase = lowercase
        self.ignore_pattern = ignore_pattern
        self._strip_ignored = _ignore_stripper(ignore_pattern)
        self.num_blocks = num_blocks
        self.ham = hamming_distance
        self.id_key = id_key
        self.max_block_size = max_block_size

    def _simhash_udf(self):
        window, lowercase = self.window, self.lowercase
        tokenization = self.tokenization
        strip_ignored = self._strip_ignored  # validated at __init__

        @pandas_udf(LongType())
        def simhash(s: pd.Series) -> pd.Series:
            punct_re = re.compile(r"\W")
            weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))

            out = np.zeros(len(s), dtype=np.int64)
            for i, text in enumerate(s):
                text = text or ""
                if lowercase:
                    text = text.lower()
                if strip_ignored is not None:
                    text = strip_ignored(text)
                if tokenization == "character":
                    shingles = [
                        text[j: j + window]
                        for j in range(max(len(text) - window + 1, 0))
                    ]
                else:
                    if tokenization == "punctuation":
                        toks = punct_re.split(text)
                    else:  # space
                        toks = [t for t in re.split(r"[ \n\t]", text) if t]
                    shingles = [
                        " ".join(toks[j: j + window])
                        for j in range(max(len(toks) - window + 1, 0))
                    ] or ([" ".join(toks)] if toks else [])
                if not shingles:
                    shingles = [text]
                # one u64 hash per shingle, then vectorized bit-majority
                h = np.fromiter(
                    (int.from_bytes(hashlib.md5(sh.encode()).digest()[:8],
                                    "little") for sh in shingles),
                    dtype=np.uint64, count=len(shingles),
                )
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
                maj = (2 * bits.sum(axis=0)) > len(shingles)
                val = np.uint64((weights[maj]).sum(dtype=np.uint64))
                out[i] = int(val.astype(np.int64))
            return pd.Series(out)

        return simhash

    def _block_exprs(self):
        nb = self.num_blocks
        width = 64 // nb
        exprs = []
        for b in range(nb):
            shift = b * width
            w = width + (64 % nb if b == nb - 1 else 0)
            mask = (1 << w) - 1
            exprs.append(
                F.struct(
                    F.lit(b).alias("block_id"),
                    (F.shiftrightunsigned(F.col("__simhash__"), shift)
                     .bitwiseAND(F.lit(mask))).alias("block_val"),
                )
            )
        return exprs

    def apply(self, df: DataFrame) -> DataFrame:
        from data_juicer_spark.functions.partitioning import (
            ensure_scan_parallelism,
        )

        order_col = self.id_key or df.columns[0]
        sh = self._simhash_udf()
        sig = ensure_scan_parallelism(df).select(
            F.col(order_col).alias("__uid__"),
            sh(F.col(self.text_key)).alias("__simhash__"))
        # 1) identical simhashes are dups by definition (hd=0): collapse
        #    them with one groupBy; only DISTINCT values enter the join
        reps = sig.groupBy("__simhash__").agg(F.min("__uid__").alias("__uid__"))
        exact_edges = (
            sig.join(reps.select("__simhash__",
                                 F.col("__uid__").alias("__rep__")), "__simhash__")
            .where(F.col("__uid__") != F.col("__rep__"))
            .select(F.col("__uid__").alias("src"), F.col("__rep__").alias("dst"))
        )
        # 2) block-decomposition candidates over distinct simhashes, capped
        blocks = reps.select(
            "__uid__", "__simhash__",
            F.explode(F.array(*self._block_exprs())).alias("blk"),
        ).select("__uid__", "__simhash__", "blk.block_id", "blk.block_val")
        counts = blocks.groupBy("block_id", "block_val").count()
        self._cap_plan = _cap_stats_plan(counts, self.max_block_size)
        ok = (counts
              .where((F.col("count") > 1) & (F.col("count") <= self.max_block_size))
              .select("block_id", "block_val"))
        blocks = blocks.join(ok, ["block_id", "block_val"])
        left, right = blocks.alias("l"), blocks.alias("r")
        near_edges = (
            left.join(
                right,
                (F.col("l.block_id") == F.col("r.block_id"))
                & (F.col("l.block_val") == F.col("r.block_val"))
                & (F.col("l.__uid__") < F.col("r.__uid__")),
            )
            .select(
                F.col("l.__uid__").alias("src"),
                F.col("r.__uid__").alias("dst"),
                F.bit_count(
                    F.col("l.__simhash__").bitwiseXOR(F.col("r.__simhash__"))
                ).alias("hd"),
            )
            .where(F.col("hd") <= self.ham)
            .select("src", "dst")
            .distinct()
        )
        comp = connected_components(exact_edges.unionByName(near_edges))
        losers = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("__loser__")
        )
        return df.join(losers, df[order_col] == F.col("__loser__"), "left_anti")


@OPERATORS.register("ngram_jaccard_deduplicator")
class NgramJaccardDeduplicator(Deduplicator):
    """NEW (training-data pipeline op): exact n-gram Jaccard near-dup.
    Candidate pairs from shared rare shingles, verified by true Jaccard
    over shingle sets — all DataFrame ops (explode + self-join + agg)."""

    def __init__(self, ngram: int = 5, threshold: float = 0.8,
                 id_key: Optional[str] = None, max_shingle_freq: int = 50, **kw):
        super().__init__(**kw)
        self.n = ngram
        self.threshold = threshold
        self.id_key = id_key
        self.max_shingle_freq = max_shingle_freq

    def apply(self, df: DataFrame) -> DataFrame:
        order_col = self.id_key or df.columns[0]
        n = self.n
        words = F.filter(F.split(F.lower(F.col(self.text_key)), r"[ \n\t]"), lambda w: w != "")
        shingles = F.expr(
            f"array_distinct(transform(sequence(0, greatest(size(__words__) - {n}, 0)), "
            f"i -> array_join(slice(__words__, i + 1, {n}), ' ')))"
        )
        sh = (
            df.select(F.col(order_col).alias("__uid__"), words.alias("__words__"))
            .where(F.size("__words__") >= n)
            .select("__uid__", F.explode(shingles).alias("shingle"),
                    F.size(shingles).alias("set_size"))
        )
        # drop ultra-common shingles (they only create hot-key candidate noise)
        counts = sh.groupBy("shingle").count()
        self._cap_plan = _cap_stats_plan(counts, self.max_shingle_freq)
        rare = counts.where(F.col("count") <= self.max_shingle_freq)
        sh = sh.join(rare.select("shingle"), "shingle")
        pairs = (
            sh.alias("a")
            .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle"))
                  & (F.col("a.__uid__") < F.col("b.__uid__")))
            .groupBy(
                F.col("a.__uid__").alias("src"), F.col("b.__uid__").alias("dst"),
                F.col("a.set_size").alias("sa"), F.col("b.set_size").alias("sb"),
            )
            .agg(F.count("*").alias("inter"))
            .withColumn("jaccard", F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")))
            .where(F.col("jaccard") >= self.threshold)
            .select("src", "dst")
        )
        comp = connected_components(pairs)
        losers = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("__loser__")
        )
        return df.join(losers, df[order_col] == F.col("__loser__"), "left_anti")


@OPERATORS.register("embedding_cosine_deduplicator")
class EmbeddingCosineDeduplicator(Deduplicator):
    """NEW (training-data pipeline op): embedding-cosine near-duplicate
    removal over an array<float> column. Candidates from random-
    hyperplane LSH buckets (sign-bit signatures — only same-bucket pairs
    are compared), verified by exact cosine >= threshold, clustered via
    connected components, keep min id_key.

    Scale guards:
    - zero driver actions at plan-build time: dim comes from the param
      if given, else the signature UDF derives it per Arrow batch;
    - bit-identical vectors collapse FIRST via a hash groupBy (star
      edges to the min uid) so a dense cluster of true duplicates never
      reaches the pair join;
    - remaining LSH buckets are size-capped (``max_bucket_size``,
      mirroring NgramJaccardDeduplicator.max_shingle_freq) so one hot
      bucket cannot go quadratic.
    """

    def __init__(self, embedding_key: str = "embedding", threshold: float = 0.95,
                 n_planes: int = 12, dim: Optional[int] = None,
                 id_key: Optional[str] = None, seed: int = 42,
                 max_bucket_size: int = 2000, **kw):
        super().__init__(**kw)
        self.embedding_key = embedding_key
        self.threshold = threshold
        self.n_planes = n_planes
        self.dim = dim
        self.id_key = id_key
        self.seed = seed
        self.max_bucket_size = max_bucket_size

    def apply(self, df: DataFrame) -> DataFrame:
        from data_juicer_spark.functions.similarity import (
            cosine, hyperplane_signatures,
        )

        order_col = self.id_key or df.columns[0]
        vec_d = F.transform(F.col(self.embedding_key), lambda x: x.cast("double"))
        sig = hyperplane_signatures(
            df.select(F.col(order_col).alias("__uid__"), vec_d.alias("__v__")),
            "__v__", self.dim, self.n_planes, self.seed,
        ).withColumn("__vk__", F.md5(F.col("__v__").cast("string")))
        # 1) collapse bit-identical vectors (guaranteed cos=1 duplicates)
        reps = sig.groupBy("__vk__").agg(
            F.min(F.struct("__uid__", "__v__", "lsh_bucket")).alias("__r__")
        ).select(
            F.col("__r__.__uid__").alias("__uid__"),
            F.col("__r__.__v__").alias("__v__"),
            F.col("__r__.lsh_bucket").alias("lsh_bucket"),
            "__vk__",
        )
        exact_edges = (
            sig.join(reps.select("__vk__", F.col("__uid__").alias("__rep__")), "__vk__")
            .where(F.col("__uid__") != F.col("__rep__"))
            .select(F.col("__uid__").alias("src"), F.col("__rep__").alias("dst"))
        )
        # 2) capped LSH bucket join over distinct vectors only
        counts = reps.groupBy("lsh_bucket").count()
        self._cap_plan = _cap_stats_plan(counts, self.max_bucket_size)
        ok_buckets = (
            counts
            .where((F.col("count") > 1) & (F.col("count") <= self.max_bucket_size))
            .select("lsh_bucket")
        )
        capped = reps.join(ok_buckets, "lsh_bucket")
        left, right = capped.alias("l"), capped.alias("r")
        near_edges = (
            left.join(right, (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
                      & (F.col("l.__uid__") < F.col("r.__uid__")))
            .select(F.col("l.__uid__").alias("src"), F.col("r.__uid__").alias("dst"),
                    cosine(F.col("l.__v__"), F.col("r.__v__")).alias("cos"))
            .where(F.col("cos") >= self.threshold)
            .select("src", "dst")
        )
        comp = connected_components(exact_edges.unionByName(near_edges))
        losers = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("__loser__"))
        return df.join(losers, df[order_col] == F.col("__loser__"), "left_anti")
