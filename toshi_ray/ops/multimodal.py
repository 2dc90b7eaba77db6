"""Multimodal column stages — image/audio/video as opaque binary columns.

The Ray-side plumbing (schema, actor-pool stage shape, batch sizing,
output layout) is real and tested; the actual codec work is STUBBED
because no image/audio libraries exist in this container:

* if PIL / soundfile import, the real decode path runs;
* otherwise each stage uses a clearly-marked deterministic fake
  (derived from the payload bytes) or raises NotImplementedError for
  operations where a fake would be misleading.

Pattern per SURVEY guidance: stateful actor pool (`map_batches(Cls,
concurrency=N, batch_size=small)`) — decoder/model state loads once per
actor; binary payloads keep batches SMALL so batch × concurrency fits
worker heaps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = [
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("mode", pa.string()),
]


class ImageDecodeStage:
    """binary `data` column → (width, height, mode, feature vector).

    Real path uses PIL when importable; STUB path derives a
    deterministic fake geometry + feature from the payload hash so the
    pipeline shape (schema, batching, actor reuse) is exercised end to
    end. Mark: `self.stubbed` tells callers which path ran.
    """

    def __init__(self, feature_dim: int = 16, data_col: str = "data", id_col: str = "doc_id"):
        self.feature_dim = feature_dim
        self.data_col = data_col
        self.id_col = id_col
        try:  # state load happens ONCE per actor
            from PIL import Image  # noqa: F401

            self.stubbed = False
            self._Image = Image
        except ImportError:
            self.stubbed = True
            self._Image = None

    def __call__(self, t: pa.Table) -> pa.Table:
        from toshi_ray.ops.dedup import _hash_strings

        if t.num_rows == 0:
            return pa.table(
                {
                    self.id_col: t[self.id_col],
                    "width": pa.array([], pa.int32()),
                    "height": pa.array([], pa.int32()),
                    "mode": pa.array([], pa.string()),
                    "feature": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.float64()), self.feature_dim
                    ),
                }
            )
        data = t[self.data_col].combine_chunks()
        if not self.stubbed:
            import io

            rows = data.to_pylist()
            w, h, mode, feats = [], [], [], []
            for payload in rows:
                img = self._Image.open(io.BytesIO(payload))
                w.append(img.width)
                h.append(img.height)
                mode.append(img.mode)
                arr = np.asarray(img.convert("L").resize((4, 4)), dtype=np.float64)
                feats.append(arr.reshape(-1)[: self.feature_dim])
            feats = np.stack(feats)
        else:
            # STUB: deterministic fake decode from payload bytes
            hs = _hash_strings(data.cast(pa.large_binary()))
            w = (hs % np.uint64(1920) + np.uint64(1)).astype(np.int32)
            h = ((hs >> np.uint64(16)) % np.uint64(1080) + np.uint64(1)).astype(np.int32)
            mode = np.where(hs % np.uint64(2) == 0, "RGB", "L")
            rng_bits = np.stack(
                [(hs >> np.uint64(4 * i)) & np.uint64(0xF) for i in range(self.feature_dim)],
                axis=1,
            ).astype(np.float64)
            feats = rng_bits / 15.0
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "width": pa.array(np.asarray(w, dtype=np.int32)),
                "height": pa.array(np.asarray(h, dtype=np.int32)),
                "mode": pa.array(list(mode), type=pa.string()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.asarray(feats, dtype=np.float64).reshape(-1)),
                    self.feature_dim,
                ),
            }
        )


class ImageResizeStage:
    """Resize stub: real work requires PIL; without it this stage raises
    (a fake resize would silently corrupt a real pipeline)."""

    def __init__(self, size: tuple[int, int] = (224, 224), data_col: str = "data"):
        self.size = size
        self.data_col = data_col
        try:
            from PIL import Image

            self._Image = Image
        except ImportError:
            self._Image = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._Image is None:
            raise NotImplementedError(
                "ImageResizeStage needs PIL; not available in this container"
            )
        import io

        out = []
        for payload in t[self.data_col].to_pylist():
            img = self._Image.open(io.BytesIO(payload)).resize(self.size)
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            out.append(buf.getvalue())
        return t.set_column(
            t.schema.get_field_index(self.data_col), self.data_col, pa.array(out, pa.binary())
        )


class FrameSampleStage:
    """Video frame-sampling stub: emits every row's sampled frame
    *offsets* (pure arithmetic — real decoding needs a video lib).
    Output layout matches what a real decoder stage would produce."""

    def __init__(self, every_n_ms: int = 1000, duration_col: str = "duration_ms",
                 id_col: str = "doc_id"):
        self.every = every_n_ms
        self.duration_col = duration_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({self.id_col: t[self.id_col],
                             "frame_ms": pa.array([], pa.int64())})
        dur = t[self.duration_col].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.maximum(dur // self.every, 0) + 1
        ids = np.repeat(t[self.id_col].to_numpy(zero_copy_only=False), counts)
        # within-row frame index, fully vectorized (no per-row arange)
        total = int(counts.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_ms": pa.array(within * self.every),
            }
        )


class AudioFeatureStage:
    """binary audio payload → (n_samples, sample_rate, feature vector).

    Real path decodes with soundfile when importable; STUB path derives
    a deterministic fake from the payload hash (like ImageDecodeStage)
    so the actor-pool shape, schema and batching are exercised end to
    end. `self.stubbed` tells callers which path ran."""

    def __init__(self, feature_dim: int = 8, data_col: str = "data",
                 id_col: str = "doc_id"):
        self.feature_dim = feature_dim
        self.data_col = data_col
        self.id_col = id_col
        try:  # decoder state loads ONCE per actor
            import soundfile  # noqa: F401

            self.stubbed = False
            self._sf = soundfile
        except ImportError:
            self.stubbed = True
            self._sf = None

    def __call__(self, t: pa.Table) -> pa.Table:
        from toshi_ray.ops.dedup import _hash_strings

        if t.num_rows == 0:
            return pa.table(
                {
                    self.id_col: t[self.id_col],
                    "n_samples": pa.array([], pa.int64()),
                    "sample_rate": pa.array([], pa.int32()),
                    "feature": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.float64()), self.feature_dim
                    ),
                }
            )
        data = t[self.data_col].combine_chunks()
        if not self.stubbed:
            import io

            ns, sr, feats = [], [], []
            for payload in data.to_pylist():
                wav, rate = self._sf.read(io.BytesIO(payload))
                wav = np.atleast_2d(np.asarray(wav, dtype=np.float64).T)
                ns.append(wav.shape[1])
                sr.append(rate)
                # band energies over equal chunks — a real (tiny) feature
                chunks = np.array_split(wav.mean(axis=0), self.feature_dim)
                feats.append(np.array([float(np.abs(c).mean()) if c.size else 0.0
                                       for c in chunks]))
            feats = np.stack(feats)
        else:
            hs = _hash_strings(data.cast(pa.large_binary()))
            ns = (hs % np.uint64(48_000 * 30) + np.uint64(1)).astype(np.int64)
            sr = np.where(hs % np.uint64(2) == 0, 16_000, 44_100).astype(np.int32)
            feats = np.stack(
                [(hs >> np.uint64(5 * i)) & np.uint64(0x1F)
                 for i in range(self.feature_dim)], axis=1
            ).astype(np.float64) / 31.0
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "n_samples": pa.array(np.asarray(ns, dtype=np.int64)),
                "sample_rate": pa.array(np.asarray(sr, dtype=np.int32)),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.asarray(feats, dtype=np.float64).reshape(-1)),
                    self.feature_dim,
                ),
            }
        )


def extract_audio_features(ds, *, concurrency: int = 4, batch_size: int = 64, **kw):
    """Actor-pool wrapper for audio payloads (small batches, wide rows)."""
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_images(ds, *, concurrency: int = 4, batch_size: int = 64, **kw):
    """Actor-pool wrapper: small batches because payloads are wide."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
