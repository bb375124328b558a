"""Multimodal operators — image/audio/video as opaque `binary` columns
with typed metadata structs.

The reference ships ~25 image/video/audio ops (filter/image_*.py,
mapper/video_*.py, deduplicator/image_deduplicator.py, …) that decode
media with PIL/ffmpeg. Those codec libraries are NOT in this container,
so the DECODE step is stubbed (deterministic fake negotiated by
`fake_decode=True`, NotImplementedError otherwise) while everything
Spark-side is real and tested: binary column handling, metadata struct
schema, Arrow batch shape through mapInPandas, per-row fault isolation,
and the phash-style dedup plumbing.

On a real deployment you replace `_decode_image` with PIL/turbojpeg —
the operator plumbing (schemas, partitioning, batching) is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_juicer_spark.operators.base import Deduplicator, Filter, Mapper
from data_juicer_spark.registry import OPERATORS

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("decode_error", T.StringType()),
])


def _decode_image(data: bytes, fake: bool):
    """Stub decode. Real impl: PIL.Image.open(io.BytesIO(data)).
    Fake mode: deterministic pseudo-image derived from the byte hash so
    the whole pipeline is testable hermetically."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/turbojpeg (not in this container); "
            "construct the operator with fake_decode=True for hermetic runs"
        )
    h = hashlib.sha256(data or b"").digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    rng = np.random.RandomState(int.from_bytes(h[2:6], "little"))
    arr = rng.randint(0, 256, size=(ht, w, 3), dtype=np.uint8)
    return arr


@OPERATORS.register("image_metadata_mapper")
class ImageMetadataMapper(Mapper):
    """Decode (stub) → attach typed metadata struct. mapInPandas so one
    Arrow batch holds many binary payloads; per-row failures are
    isolated into meta.decode_error (the reference's skip_op_error
    sample-drop semantics, base_op.py:52-133, as a DLQ column)."""

    def __init__(self, image_key: str = "image", meta_key: str = "image_meta",
                 fake_decode: bool = True, **kw):
        super().__init__(**kw)
        self.image_key = image_key
        self.meta_key = meta_key
        self.fake = fake_decode

    def apply(self, df: DataFrame) -> DataFrame:
        if self.meta_key in df.columns:
            # already generated (reference already-computed check) —
            # appending would duplicate the column name in the schema
            return df
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField(self.meta_key, IMAGE_META_SCHEMA)]
        )
        img_key, meta_key, fake = self.image_key, self.meta_key, self.fake

        def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                metas = []
                for data in pdf[img_key]:
                    try:
                        arr = _decode_image(data, fake)
                        metas.append({
                            "width": int(arr.shape[1]),
                            "height": int(arr.shape[0]),
                            "n_channels": int(arr.shape[2]),
                            "format": "fake" if fake else "raw",
                            "decode_error": None,
                        })
                    except Exception as e:  # per-row fault isolation
                        metas.append({
                            "width": None, "height": None, "n_channels": None,
                            "format": None, "decode_error": str(e)[:200],
                        })
                pdf[meta_key] = metas
                yield pdf

        return df.mapInPandas(process, schema=out_schema)


@OPERATORS.register("image_shape_filter")
class ImageShapeFilter(Filter):
    """Keep images whose width/height are in range — the reference's
    image_shape_filter shape (filter/image_shape_filter.py). Runs on the
    metadata struct (decode once upstream, filter in Catalyst)."""

    def __init__(self, min_width: int = 1, max_width: int = 1 << 20,
                 min_height: int = 1, max_height: int = 1 << 20,
                 any_or_all: str = "any",
                 meta_key: str = "image_meta", **kw):
        super().__init__(**kw)
        self.min_w, self.max_w = min_width, max_width
        self.min_h, self.max_h = min_height, max_height
        if any_or_all not in ("any", "all"):
            raise ValueError(
                f"Keep strategy [{any_or_all}] is not supported. "
                f'Can only be one of ["any", "all"].')
        self.any = any_or_all == "any"
        self.meta_key = meta_key

    def _ok(self, m):
        return (m.getField("decode_error").isNull()
                & m.getField("width").between(self.min_w, self.max_w)
                & m.getField("height").between(self.min_h, self.max_h))

    def apply(self, df: DataFrame) -> DataFrame:
        dt = df.schema[self.meta_key].dataType
        col = F.col(self.meta_key)
        if isinstance(dt, T.ArrayType):
            # multi-image samples: any/all fold like the reference
            hit = (F.exists(col, self._ok) if self.any
                   else F.forall(col, self._ok))
            return df.filter(col.isNull() | (F.size(col) == 0) | hit)
        # no-media samples are kept in BOTH schema shapes (reference
        # keeps samples whose media list is empty)
        return df.filter(col.isNull() | self._ok(col))


@OPERATORS.register("image_phash_deduplicator")
class ImagePhashDeduplicator(Deduplicator):
    """Perceptual-hash dedup plumbing (image_deduplicator.py:141 mirror):
    decode (stub) → 8x8 grayscale downsample → mean-threshold bits →
    64-bit phash → exact groupBy keep-first. The phash math is real; only
    the decode is stubbed."""

    def __init__(self, image_key: str = "image", id_key: Optional[str] = None,
                 fake_decode: bool = True, **kw):
        super().__init__(**kw)
        self.image_key = image_key
        self.id_key = id_key
        self.fake = fake_decode

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql import Window

        fake = self.fake

        @pandas_udf(T.LongType())
        def phash(s: pd.Series) -> pd.Series:
            out = np.zeros(len(s), dtype=np.int64)
            for i, data in enumerate(s):
                try:
                    arr = _decode_image(data, fake).astype(np.float64)
                except Exception:
                    out[i] = -1
                    continue
                gray = arr.mean(axis=2)
                h, w = gray.shape
                ys = (np.arange(8) * h // 8)
                xs = (np.arange(8) * w // 8)
                small = gray[np.ix_(ys, xs)]
                bits = (small > small.mean()).flatten()
                val = 0
                for b in range(64):
                    if bits[b]:
                        val |= 1 << b
                out[i] = np.uint64(val).astype(np.int64)
            return pd.Series(out)

        order_col = self.id_key or df.columns[0]
        w = Window.partitionBy("__phash__").orderBy(F.col(order_col).asc())
        return (
            df.withColumn("__phash__", phash(F.col(self.image_key)))
            .withColumn("__rn__", F.row_number().over(w))
            .where((F.col("__rn__") == 1) | (F.col("__phash__") == -1))
            .drop("__phash__", "__rn__")
        )


@OPERATORS.register("audio_duration_filter")
class AudioDurationFilter(Filter):
    """Audio as binary + sample-rate metadata; duration from byte length
    (PCM assumption in fake mode; real impl reads the container header).
    Mirrors filter/audio_duration_filter.py."""

    def __init__(self, min_duration: float = 0.0, max_duration: float = 1e9,
                 any_or_all: str = "any", audio_key: str = "audio",
                 sample_rate: int = 16000, bytes_per_sample: int = 2,
                 min_seconds: Optional[float] = None,
                 max_seconds: Optional[float] = None, **kw):
        super().__init__(**kw)
        # reference names are min_duration/max_duration
        # (audio_duration_filter.py:29-38); the engine's original
        # min_seconds/max_seconds stay as aliases
        self.lo = min_seconds if min_seconds is not None else min_duration
        self.hi = max_seconds if max_seconds is not None else max_duration
        if any_or_all not in ("any", "all"):
            raise ValueError(
                f"Keep strategy [{any_or_all}] is not supported. "
                f'Can only be one of ["any", "all"].')
        self.any = any_or_all == "any"
        self.audio_key = audio_key
        self.rate = sample_rate * bytes_per_sample

    def apply(self, df: DataFrame) -> DataFrame:
        dt = df.schema[self.audio_key].dataType
        col = F.col(self.audio_key)
        if isinstance(dt, T.ArrayType):
            durs = F.transform(col, lambda x: F.length(x) / F.lit(self.rate))
            ok = (lambda d: d.between(self.lo, self.hi))
            hit = F.exists(durs, ok) if self.any else F.forall(durs, ok)
            # reference: a sample with no audio records [] and is kept
            empty = col.isNull() | (F.size(durs) == 0)
            return df.filter(empty | hit)
        dur = F.length(col) / F.lit(self.rate)
        return df.filter(col.isNull() | dur.between(self.lo, self.hi))


@OPERATORS.register("video_frame_sample_mapper")
class VideoFrameSampleMapper(Mapper):
    """Frame sampling plumbing: binary video → N frame rows (1→N
    expansion through mapInPandas, like mapper/video_split_by_*). Frame
    extraction is stubbed to deterministic byte slices."""

    def __init__(self, video_key: str = "video", n_frames: int = 3,
                 fake_decode: bool = True, **kw):
        super().__init__(**kw)
        self.video_key = video_key
        self.n_frames = n_frames
        self.fake = fake_decode

    def apply(self, df: DataFrame) -> DataFrame:
        out_schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("frame_id", T.IntegerType()),
               T.StructField("frame", T.BinaryType())]
        )
        vkey, n, fake = self.video_key, self.n_frames, self.fake

        def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for _, row in pdf.iterrows():
                    data = row[vkey] or b""
                    if not fake:
                        raise NotImplementedError("video decode needs ffmpeg")
                    step = max(len(data) // max(n, 1), 1)
                    for fi in range(n):
                        r = row.to_dict()
                        r["frame_id"] = fi
                        r["frame"] = bytes(data[fi * step:(fi + 1) * step]) or b"\0"
                        rows.append(r)
                yield pd.DataFrame(rows, columns=list(pdf.columns) + ["frame_id", "frame"])

        return df.mapInPandas(process, schema=out_schema)

def size_to_bytes(size: str) -> int:
    """Faithful port of the reference's human-size parser
    (utils/mm_utils.py:922-953), including its digit-concatenation
    quirk ("1.5kb" → digits "15" → 15 KiB) — recipes written against
    the reference must resolve to identical thresholds."""
    alphas = [c for c in size if c.isalpha()]
    digits = [c for c in size if c.isdigit()]
    if not digits:
        raise ValueError(f"Your input `size` does not contain numbers: {size}")
    n = int(float("".join(digits)))
    if not alphas:
        return n
    suffix = "".join(alphas).lower()
    shifts = {"kb": 10, "kib": 10, "mb": 20, "mib": 20, "gb": 30,
              "gib": 30, "tb": 40, "tib": 40, "pb": 50, "pib": 50,
              "eb": 60, "eib": 60, "zb": 70, "zib": 70, "yb": 80,
              "yib": 80}
    if suffix not in shifts:
        raise ValueError(f"You specified unidentifiable unit: {suffix}")
    return n << shifts[suffix]


class _MediaSizeFilter(Filter):
    """Shared engine for audio_size_filter / image_size_filter
    (filter/audio_size_filter.py:21-71, filter/image_size_filter.py):
    keep samples whose media payload sizes fall in [min_size, max_size]
    under an any/all strategy. Sizes come from the in-table binary
    payload (octet_length, pure Catalyst) or, for path-typed columns,
    a distributed file stat in an Arrow-batched UDF — no driver I/O.
    Samples with no media are kept, matching the reference."""

    media_key_default = "audio"

    def __init__(self, min_size: str = "0", max_size: str = "1TB",
                 any_or_all: str = "any", media_key: Optional[str] = None,
                 **kw):
        super().__init__(**kw)
        self.lo = size_to_bytes(min_size)
        self.hi = size_to_bytes(max_size)
        if any_or_all not in ("any", "all"):
            raise ValueError(
                f"Keep strategy [{any_or_all}] is not supported. "
                f'Can only be one of ["any", "all"].')
        self.any = any_or_all == "any"
        self.media_key = media_key or self.media_key_default

    def _sizes(self, df: DataFrame) -> F.Column:
        dt = df.schema[self.media_key].dataType
        col = F.col(self.media_key)
        if isinstance(dt, T.BinaryType):
            return F.array(F.octet_length(col))
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType,
                                                      T.BinaryType):
            return F.transform(col, F.octet_length)
        if isinstance(dt, T.StringType):
            return F.array(_stat_size(col))
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType,
                                                      T.StringType):
            return F.transform(col, _stat_size)
        raise ValueError(
            f"{self.media_key} must be binary/string or an array of "
            f"them, got {dt.simpleString()}")

    def apply(self, df: DataFrame) -> DataFrame:
        sizes = self._sizes(df)
        # per-size keep via the Filter-base strategy (get_keep_boolean
        # honoring reversed_range / interval closedness, applied BEFORE
        # the any/all fold — audio_size_filter.py:60-71)
        ok = (lambda s: self.keep_between(s, self.lo, self.hi))
        hit = F.exists(sizes, ok) if self.any else F.forall(sizes, ok)
        empty = F.col(self.media_key).isNull() | (F.size(sizes) == 0)
        return df.filter(empty | hit)


@F.pandas_udf(T.LongType())
def _stat_size(paths: pd.Series) -> pd.Series:
    import os

    def stat(p):
        try:
            return os.path.getsize(p)
        except OSError:
            return -1

    return paths.map(lambda p: stat(p) if p else -1)


@OPERATORS.register("audio_size_filter")
class AudioSizeFilter(_MediaSizeFilter):
    media_key_default = "audio"


@OPERATORS.register("image_size_filter")
class ImageSizeFilter(_MediaSizeFilter):
    media_key_default = "image"


@OPERATORS.register("image_aspect_ratio_filter")
class ImageAspectRatioFilter(Filter):
    """Keep images whose width/height ratio is in range
    (filter/image_aspect_ratio_filter.py: defaults 0.333–3.0). Runs on
    the decoded metadata struct like image_shape_filter — decode once
    upstream, filter in Catalyst."""

    def __init__(self, min_ratio: float = 0.333, max_ratio: float = 3.0,
                 any_or_all: str = "any",
                 meta_key: str = "image_meta", **kw):
        super().__init__(**kw)
        self.lo, self.hi = min_ratio, max_ratio
        if any_or_all not in ("any", "all"):
            raise ValueError(
                f"Keep strategy [{any_or_all}] is not supported. "
                f'Can only be one of ["any", "all"].')
        self.any = any_or_all == "any"
        self.meta_key = meta_key

    def _ok(self, m):
        ratio = m.getField("width") / m.getField("height")
        return (m.getField("decode_error").isNull()
                & self.keep_between(ratio, self.lo, self.hi))

    def apply(self, df: DataFrame) -> DataFrame:
        dt = df.schema[self.meta_key].dataType
        col = F.col(self.meta_key)
        if isinstance(dt, T.ArrayType):
            hit = (F.exists(col, self._ok) if self.any
                   else F.forall(col, self._ok))
            return df.filter(col.isNull() | (F.size(col) == 0) | hit)
        # no-media kept in both schema shapes (see ImageShapeFilter)
        return df.filter(col.isNull() | self._ok(col))

@OPERATORS.register("video_deduplicator")
class VideoDeduplicator(Deduplicator):
    """Exact video dedup (deduplicator/video_deduplicator.py:43-90):
    the reference md5-hashes the container's video-stream packets (PyAV
    demux — codec dep, stubbed here to the raw payload bytes, same
    exact-match semantics) and keeps the first sample per hash;
    consider_text adds the text md5 to the key. Pure Catalyst: JVM md5
    + groupBy keep-min-id, no Python in the hot path."""

    def __init__(self, video_key: str = "video", consider_text: bool = False,
                 id_key: Optional[str] = None, text_key: str = "text", **kw):
        super().__init__(**kw)
        self.video_key = video_key
        self.consider_text = consider_text
        self.id_key = id_key
        self.text_key = text_key

    def _video_hash(self, df: DataFrame) -> F.Column:
        dt = df.schema[self.video_key].dataType
        col = F.col(self.video_key)
        if isinstance(dt, T.BinaryType):
            return F.md5(col)
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType,
                                                      T.BinaryType):
            # all payloads feed one digest in the reference; concat the
            # byte streams before hashing to mirror that
            return F.md5(F.aggregate(
                col, F.lit(b""), lambda acc, x: F.concat(acc, x)))
        raise ValueError(
            f"{self.video_key} must be binary or array<binary>, "
            f"got {dt.simpleString()}")

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        # coalesce each part: F.concat null-propagates, and a null text
        # (or null video) must form its OWN key group, not collapse
        # every null row into one
        key = F.coalesce(self._video_hash(df), F.lit("\x00novideo"))
        if self.consider_text:
            key = F.concat(key, F.coalesce(F.md5(F.col(self.text_key)),
                                           F.lit("\x00notext")))
        order_col = self.id_key or df.columns[0]
        w = Window.partitionBy("__vhash__").orderBy(F.col(order_col).asc())
        return (df.withColumn("__vhash__", key)
                .withColumn("__rn__", F.row_number().over(w))
                .where(F.col("__rn__") == 1)
                .drop("__vhash__", "__rn__"))

def _row_rng(data: bytes, salt: str) -> np.random.RandomState:
    """Seeded per-row RNG keyed on the payload — deterministic and
    shuffle/partition-independent (same pattern as the augment
    mappers)."""
    h = hashlib.sha256((salt.encode() + (data or b""))).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "little"))


@OPERATORS.register("audio_add_gaussian_noise_mapper")
class AudioAddGaussianNoiseMapper(Mapper):
    """Add Gaussian noise to audio payloads
    (mapper/audio_add_gaussian_noise_mapper.py:31-60 — audiomentations'
    AddGaussianNoise): amplitude drawn uniformly in
    [min_amplitude, max_amplitude] (linear, full-scale 1.0), applied
    with probability p per sample. Audio is PCM int16 bytes (the same
    contract as audio_duration_filter; container codecs are the stubbed
    step) and the DSP itself is real vectorized numpy inside an
    Arrow-batched UDF. Per-row RNG is payload-seeded, so results are
    independent of partitioning."""

    def __init__(self, min_amplitude: float = 0.001,
                 max_amplitude: float = 0.015, p: float = 0.5,
                 audio_key: str = "audio", save_dir: str | None = None,
                 **kw):
        super().__init__(**kw)
        if save_dir is not None:
            raise NotImplementedError(
                "save_dir writes modified media FILES in the reference; "
                "this engine keeps payloads in-table (binary column) — "
                "export via a sink instead")
        if min_amplitude >= max_amplitude:
            raise ValueError("min_amplitude must be < max_amplitude")
        self.min_amp, self.max_amp = min_amplitude, max_amplitude
        self.p = p
        self.audio_key = audio_key

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        lo, hi, p = self.min_amp, self.max_amp, self.p

        @pandas_udf(T.BinaryType())
        def add_noise(s: pd.Series) -> pd.Series:
            def one(data):
                if data is None or len(data) < 2:
                    return data  # no audio: unchanged, like the reference
                rng = _row_rng(data, "gauss_noise")
                if rng.rand() >= p:
                    return data
                pcm = np.frombuffer(
                    data[:len(data) // 2 * 2], dtype="<i2")
                amp = rng.uniform(lo, hi)
                noisy = pcm.astype(np.float32) / 32768.0 \
                    + rng.randn(len(pcm)).astype(np.float32) * amp
                out = np.clip(noisy * 32768.0, -32768, 32767)
                return out.astype("<i2").tobytes()

            return s.map(one)

        return df.withColumn(self.audio_key, add_noise(F.col(self.audio_key)))


def _blur_kernel_1d(blur_type: str, radius: float) -> np.ndarray:
    """Separable 1-D kernel: box/mean = uniform (PIL BoxBlur / the
    fixed 5x5 BLUR filter), gaussian = sampled normal pdf truncated at
    ~2.5 sigma like PIL's GaussianBlur."""
    if blur_type == "mean":
        return np.ones(5) / 5.0
    r = max(int(round(radius)), 0)
    if r == 0:
        return np.ones(1)
    if blur_type == "box":
        return np.ones(2 * r + 1) / (2 * r + 1)
    sigma = max(radius, 1e-6)
    xs = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(xs ** 2) / (2 * sigma * sigma))
    return k / k.sum()


@OPERATORS.register("image_blur_mapper")
class ImageBlurMapper(Mapper):
    """Blur images with probability p (mapper/image_blur_mapper.py:29-67):
    blur_type in {mean, box, gaussian}, kernel radius as in PIL. The
    separable convolution is real numpy (edge-replicate padding, like
    PIL); only the image DECODE is stubbed (fake_decode), so the output
    payload is raw RGB bytes with width/height prepended into the
    companion meta column by image_metadata_mapper downstream. Per-row
    RNG is payload-seeded (partitioning-independent)."""

    def __init__(self, p: float = 0.2, blur_type: str = "gaussian",
                 radius: float = 2, image_key: str = "image",
                 fake_decode: bool = True, save_dir: str | None = None,
                 **kw):
        super().__init__(**kw)
        if save_dir is not None:
            raise NotImplementedError(
                "save_dir writes modified media FILES in the reference; "
                "this engine keeps payloads in-table (binary column) — "
                "export via a sink instead")
        if blur_type not in ("mean", "box", "gaussian"):
            raise ValueError(
                f"Blur_type [{blur_type}] is not supported. "
                f'Can only be one of ["mean", "box", "gaussian"]. ')
        if radius < 0:
            raise ValueError("Radius must be >= 0. ")
        self.p = p
        self.blur_type = blur_type
        self.radius = radius
        self.image_key = image_key
        self.fake = fake_decode

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        p, fake = self.p, self.fake
        kernel = _blur_kernel_1d(self.blur_type, self.radius)

        @pandas_udf(T.BinaryType())
        def blur(s: pd.Series) -> pd.Series:
            def one(data):
                if data is None:
                    return data
                rng = _row_rng(data, "image_blur")
                if rng.rand() >= p:
                    return data
                arr = _decode_image(data, fake).astype(np.float64)
                pad = len(kernel) // 2
                if pad:
                    # separable convolution, edge-replicate like PIL
                    a = np.pad(arr, ((pad, pad), (0, 0), (0, 0)), "edge")
                    arr = np.apply_along_axis(
                        lambda m: np.convolve(m, kernel, "valid"), 0, a)
                    a = np.pad(arr, ((0, 0), (pad, pad), (0, 0)), "edge")
                    arr = np.apply_along_axis(
                        lambda m: np.convolve(m, kernel, "valid"), 1, a)
                return np.clip(arr, 0, 255).astype(np.uint8).tobytes()

            return s.map(one)

        return df.withColumn(self.image_key, blur(F.col(self.image_key)))

def build_ffmpeg_command(in_path: str, out_path: str, stream_flag: str,
                         filter_name: str, filter_kwargs: Optional[dict],
                         global_args: Optional[list],
                         overwrite: bool) -> list:
    """Pure command builder for the ffmpeg-wrapped mappers (testable
    without ffmpeg): `ffmpeg [-y] -i in -vf/-af name=k=v:k2=v2
    [global_args...] out` — the CLI equivalent of ffmpeg-python's
    input().filter(...).output().global_args(...) chain."""
    spec = filter_name
    if filter_kwargs:
        spec += "=" + ":".join(f"{k}={v}" for k, v in filter_kwargs.items())
    cmd = ["ffmpeg"]
    if overwrite:
        cmd.append("-y")
    cmd += ["-i", in_path, stream_flag, spec]
    if global_args:
        cmd += list(global_args)
    cmd.append(out_path)
    return cmd


class _FFmpegWrappedMapper(Mapper):
    """Shared engine for audio/video_ffmpeg_wrapped_mapper
    (mapper/video_ffmpeg_wrapped_mapper.py:24-95): apply one named
    ffmpeg filter to each media FILE (path column), distributed — the
    subprocess runs on the executor that owns the row, per-row failures
    land in DLQ status/error columns. Requires the ffmpeg binary on
    executor PATH (not present in this container — command construction
    and absence behavior are what the tests cover); filter_name=None is
    the reference's identity passthrough."""

    stream_flag = "-vf"
    media_key_default = "video"
    op_name = "video_ffmpeg_wrapped_mapper"

    def __init__(self, filter_name: Optional[str] = None,
                 filter_kwargs: Optional[dict] = None,
                 global_args: Optional[list] = None,
                 capture_stderr: bool = True, overwrite_output: bool = True,
                 save_dir: Optional[str] = None,
                 media_key: Optional[str] = None, **kw):
        super().__init__(**kw)
        self.filter_name = filter_name
        self.filter_kwargs = dict(filter_kwargs or {})
        self.global_args = list(global_args or [])
        self.capture_stderr = capture_stderr
        self.overwrite_output = overwrite_output
        self.save_dir = save_dir
        self.media_key = media_key or self.media_key_default

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        key = self.media_key
        if self.filter_name is None:
            return df  # identity, like the reference
        fname, fkw = self.filter_name, self.filter_kwargs
        gargs, overwrite = self.global_args, self.overwrite_output
        capture, save_dir = self.capture_stderr, self.save_dir
        flag, op_name = self.stream_flag, self.op_name

        out_schema = T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("error", T.StringType()),
        ])

        @pandas_udf(out_schema)
        def run_filter(paths: pd.Series) -> pd.DataFrame:
            import os
            import shutil
            import subprocess

            have = shutil.which("ffmpeg") is not None

            def one(p):
                if p is None or p == "":
                    return (None, "failed", "empty path")
                if not have:
                    return (None, "failed",
                            "NotImplementedError: ffmpeg binary not on "
                            "executor PATH")
                try:
                    stem, ext = os.path.splitext(os.path.basename(p))
                    out_dir = save_dir or os.path.dirname(p) or "."
                    os.makedirs(out_dir, exist_ok=True)
                    out = os.path.join(out_dir,
                                       f"{stem}.{op_name}{ext}")
                    cmd = build_ffmpeg_command(p, out, flag, fname, fkw,
                                               gargs, overwrite)
                    subprocess.run(
                        cmd, check=True,
                        stderr=subprocess.PIPE if capture else None)
                    return (out, "success", None)
                except Exception as e:  # per-row DLQ isolation
                    return (None, "failed", f"{type(e).__name__}: {e}")

            rows = [one(p) for p in paths]
            return pd.DataFrame(rows, columns=["path", "status", "error"])

        out = df.withColumn("__ff__", run_filter(F.col(key)))
        return (out.select(
            "*",
            out["__ff__.path"].alias(f"{key}_out"),
            out["__ff__.status"].alias(f"{key}_status"),
            out["__ff__.error"].alias(f"{key}_error"),
        ).drop("__ff__"))


@OPERATORS.register("video_ffmpeg_wrapped_mapper")
class VideoFFmpegWrappedMapper(_FFmpegWrappedMapper):
    stream_flag = "-vf"
    media_key_default = "video"
    op_name = "video_ffmpeg_wrapped_mapper"


@OPERATORS.register("audio_ffmpeg_wrapped_mapper")
class AudioFFmpegWrappedMapper(_FFmpegWrappedMapper):
    stream_flag = "-af"
    media_key_default = "audio"
    op_name = "audio_ffmpeg_wrapped_mapper"

@OPERATORS.register("image_resize_mapper")
class ImageResizeMapper(Mapper):
    """Resize images to (width, height) — the resize half of the
    reference's image transform family (e.g.
    mapper/video_resize_resolution_mapper.py's PIL/ffmpeg resize).
    Nearest or bilinear interpolation in real numpy (vectorized index
    arithmetic, half-pixel centers like PIL); decode is the stubbed
    step, output is raw RGB bytes matching image_blur_mapper's
    contract."""

    def __init__(self, width: int, height: int,
                 interpolation: str = "bilinear",
                 image_key: str = "image", fake_decode: bool = True, **kw):
        super().__init__(**kw)
        if width < 1 or height < 1:
            raise ValueError("width and height must be >= 1")
        if interpolation not in ("nearest", "bilinear"):
            raise ValueError(
                f"interpolation [{interpolation}] is not supported. "
                f'Can only be one of ["nearest", "bilinear"].')
        self.w, self.h = width, height
        self.interpolation = interpolation
        self.image_key = image_key
        self.fake = fake_decode

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        w, h, interp, fake = self.w, self.h, self.interpolation, self.fake

        @pandas_udf(T.BinaryType())
        def resize(s: pd.Series) -> pd.Series:
            def one(data):
                if data is None:
                    return data
                arr = _decode_image(data, fake).astype(np.float64)
                sh, sw = arr.shape[:2]
                # half-pixel-center source coordinates (PIL convention)
                xs = (np.arange(w) + 0.5) * sw / w - 0.5
                ys = (np.arange(h) + 0.5) * sh / h - 0.5
                if interp == "nearest":
                    xi = np.clip(np.round(xs).astype(int), 0, sw - 1)
                    yi = np.clip(np.round(ys).astype(int), 0, sh - 1)
                    out = arr[np.ix_(yi, xi)]
                else:
                    x0 = np.clip(np.floor(xs).astype(int), 0, sw - 1)
                    x1 = np.clip(x0 + 1, 0, sw - 1)
                    y0 = np.clip(np.floor(ys).astype(int), 0, sh - 1)
                    y1 = np.clip(y0 + 1, 0, sh - 1)
                    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
                    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
                    out = (arr[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
                           + arr[np.ix_(y0, x1)] * (1 - fy) * fx
                           + arr[np.ix_(y1, x0)] * fy * (1 - fx)
                           + arr[np.ix_(y1, x1)] * fy * fx)
                return np.clip(np.round(out), 0, 255) \
                    .astype(np.uint8).tobytes()

            return s.map(one)

        return df.withColumn(self.image_key, resize(F.col(self.image_key)))
