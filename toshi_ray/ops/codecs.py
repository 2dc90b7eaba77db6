"""Pure-numpy / stdlib codecs for the multimodal stages.

The sandbox has no PIL / soundfile, but two real formats ARE decodable
with nothing beyond numpy and the Python stdlib:

* PNM images (PGM ``P2``/``P5`` grayscale, PPM ``P3``/``P6`` RGB,
  8- or 16-bit) — the netpbm formats, a published spec.
* PCM WAV audio (8/16/24/32-bit int, any channel count) via the
  stdlib ``wave`` module.

These give ImageDecodeStage / AudioFeatureStage / ImageResizeStage a
genuinely working codec path in-container; anything else still falls
back to the clearly-marked deterministic fake (see multimodal.py).

Everything here is per-payload by nature (each blob is one opaque
object); the numpy work inside a payload is vectorized.
"""

from __future__ import annotations

import io
import wave

import numpy as np

# ---------------------------------------------------------------- sniffing


def sniff(payload: bytes) -> str | None:
    """Identify a payload the builtin codecs can decode.

    Returns ``"pnm"``, ``"wav"`` or None. Cheap: looks only at magic
    bytes, so it is safe to call per row in a batch loop.
    """
    if len(payload) >= 2 and payload[0:1] == b"P" and payload[1:2] in b"2356":
        return "pnm"
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# JPEG start-of-frame markers that carry geometry: SOF0-SOF15 minus the
# non-frame DHT (C4), JPG (C8) and DAC (CC) markers — the published
# ITU T.81 table.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """Header-only geometry sniff → (format, width, height) or None.

    Reads ONLY the header bytes of the published container formats —
    the way a 100-TB pipeline filters/buckets images by size without
    paying a decode: PNG (IHDR), GIF (logical screen descriptor),
    JPEG (segment scan to the first SOFn frame header), and the PNM
    formats the builtin codec fully decodes. Pure stdlib."""
    import struct

    def _ok(fmt: str, w: int, h: int):
        # PNG/spec max is 2^31-1; anything outside (0, 2^31) is a
        # corrupt/hostile header — report unparseable, never wrap an
        # int32 downstream
        if 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF:
            return (fmt, w, h)
        return None

    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return _ok("png", w, h)
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return _ok("gif", w, h)
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= n:
            if payload[i] != 0xFF:  # not at a marker: corrupt stream
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte padding
                i += 1
                continue
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return _ok("jpeg", w, h)
            if marker in (0xDA, 0xD9):
                # SOS/EOI before any SOF: the header section ended with
                # no parseable geometry — stop rather than walk
                # entropy-coded data (stuffed FF 00 bytes would be
                # misread as segments with garbage lengths)
                return None
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    if sniff(payload) == "pnm":
        try:
            _, w, h, _, _ = _pnm_header(payload)
            return _ok("pnm", w, h)
        except Exception:
            return None
    return None


# ---------------------------------------------------------------- PNM


def _pnm_header(buf: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse (magic, width, height, maxval, raster_offset).

    Whitespace-separated tokens; ``#`` comments run to end of line.
    The binary raster starts exactly one whitespace byte after maxval.
    """
    toks: list[bytes] = []
    i = 0
    n = len(buf)
    while len(toks) < 4:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if i >= n:
            raise ValueError("truncated PNM header")
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        toks.append(buf[i:j])
        i = j
    magic = toks[0]
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError("bad PNM dimensions")
    return magic, w, h, maxval, i + 1  # +1: single whitespace before raster


def decode_pnm(payload: bytes) -> tuple[np.ndarray, str]:
    """PNM bytes → (HxWxC uint array, mode) with mode "L" or "RGB"."""
    magic, w, h, maxval, off = _pnm_header(payload)
    channels = 3 if magic in (b"P3", b"P6") else 1
    count = w * h * channels
    if magic in (b"P5", b"P6"):
        dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        raster = np.frombuffer(payload, dt, count=count, offset=off)
    else:  # ASCII rasters: strip comment lines, then split
        body = b"\n".join(
            ln.split(b"#", 1)[0] for ln in payload[off - 1 :].splitlines()
        )
        vals = body.split()
        if len(vals) < count:
            raise ValueError("truncated PNM raster")
        raster = np.array(vals[:count], dtype=np.uint16 if maxval > 255 else np.uint8)
    arr = raster.astype(np.uint16 if maxval > 255 else np.uint8, copy=False)
    arr = arr.reshape(h, w, channels)
    return arr, ("RGB" if channels == 3 else "L")


def encode_pnm(arr: np.ndarray) -> bytes:
    """HxW or HxWx{1,3} uint array → binary PGM (P5) / PPM (P6) bytes."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("encode_pnm wants 1 or 3 channels")
    maxval = 65535 if arr.dtype.itemsize > 1 else 255
    magic = b"P6" if c == 3 else b"P5"
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    header = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
    return header + np.ascontiguousarray(arr, dtype=dt).tobytes()


# ---------------------------------------------------------------- resize


def to_gray(arr: np.ndarray) -> np.ndarray:
    """HxWxC uint → HxW float64 (ITU-R 601 luma for RGB)."""
    if arr.ndim == 2:
        return arr.astype(np.float64)
    if arr.shape[2] == 1:
        return arr[:, :, 0].astype(np.float64)
    w = np.array([0.299, 0.587, 0.114])
    return arr[:, :, :3].astype(np.float64) @ w


def _axis_resize(arr: np.ndarray, out: int, axis: int) -> np.ndarray:
    """Resize one axis: block mean when shrinking, nearest when growing."""
    n = arr.shape[axis]
    if out == n:
        return arr
    a = np.moveaxis(arr, axis, 0).astype(np.float64, copy=False)
    if out < n:
        bounds = np.floor(np.linspace(0, n, out + 1)).astype(np.int64)
        sums = np.add.reduceat(a, bounds[:-1], axis=0)
        widths = np.diff(bounds).astype(np.float64)
        res = sums / widths.reshape((-1,) + (1,) * (a.ndim - 1))
    else:
        idx = np.minimum(((np.arange(out) + 0.5) * n / out).astype(np.int64), n - 1)
        res = a[idx]
    return np.moveaxis(res, 0, axis)


def box_resize(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Resize HxW[.xC] to (out_w, out_h) — PIL argument order (w, h)."""
    out_w, out_h = size
    return _axis_resize(_axis_resize(arr, out_h, 0), out_w, 1)


def image_feature(arr: np.ndarray, feature_dim: int) -> np.ndarray:
    """Grayscale mean-pool grid feature, normalized to [0, 1]."""
    side = max(int(np.ceil(np.sqrt(feature_dim))), 1)
    g = box_resize(to_gray(arr), (side, side)).reshape(-1)
    maxval = 65535.0 if arr.dtype.itemsize > 1 else 255.0
    feat = np.zeros(feature_dim, dtype=np.float64)
    feat[: min(feature_dim, g.size)] = g[:feature_dim] / maxval
    return feat


# ---------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float64 [n_frames, channels] in [-1, 1], rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        ch, sw, rate = f.getnchannels(), f.getsampwidth(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 3:  # packed little-endian 24-bit: sign-extend by hand
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v -= (v >> 23) << 24
        x = v.astype(np.float64) / float(1 << 23)
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / float(1 << 31)
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float64 [n, ch] in [-1, 1] → 16-bit PCM WAV bytes (for tests)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(pcm).tobytes())
    return buf.getvalue()


def audio_feature(x: np.ndarray, feature_dim: int) -> np.ndarray:
    """Mean-abs band energies over equal time chunks of the mono mix."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    chunks = np.array_split(mono, feature_dim)
    return np.array(
        [float(np.abs(c).mean()) if c.size else 0.0 for c in chunks], dtype=np.float64
    )
