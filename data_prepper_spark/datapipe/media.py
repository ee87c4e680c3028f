"""Real media decode, stdlib-only: PNG and WAV.

The container has no PIL/av/cv2, but — exactly like the avro,
protobuf-wire, and MaxMind-DB readers before — the FORMATS are public
specs, and the two that matter for fixture-grade multimodal work need
nothing beyond the standard library: PNG is zlib (stdlib) +
per-scanline filters, WAV is RIFF framing the stdlib `wave` module
already parses. This replaces the honest NotImplementedError stub for
those mimes; video stays stubbed (no codec exists in-sandbox).

Decoders are pure functions over bytes -> numpy, called from
Arrow-batched UDFs in multimodal.py; encoder twins exist so fixtures
are self-made and round-trips are asserted, not assumed.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG (spec: 8-bit greyscale/RGB/RGBA, non-interlaced; filters 0-4)
# ---------------------------------------------------------------------------

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array."""
    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    i = 8
    w = h = None
    ctype = None
    idat = bytearray()
    while i < len(b):
        (ln,) = struct.unpack(">I", b[i:i + 4])
        typ = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + ln]
        i += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).copy()
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 2:  # up
            line += prev
        elif f in (1, 3, 4):  # sub / average / paeth: left-sequential
            cur = line.astype(np.int32)
            p32 = prev.astype(np.int32)
            acc = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = acc[x - ch] if x >= ch else 0
                bb = p32[x]
                if f == 1:
                    val = cur[x] + a
                elif f == 3:
                    val = cur[x] + (a + bb) // 2
                else:
                    c = p32[x - ch] if x >= ch else 0
                    pa, pb, pc = abs(bb - c), abs(a - c), abs(a + bb - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        bb if pb <= pc else c
                    )
                    val = cur[x] + pred
                acc[x] = val & 0xFF
            line = acc.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, {1,2,3,4}) uint8 -> PNG bytes (filter 0)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += arr[y].tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV (PCM, via stdlib wave)
# ---------------------------------------------------------------------------


def decode_wav(b: bytes):
    """WAV bytes -> (samples float32 in [-1,1] shaped (n, channels),
    sample_rate)."""
    with wave.open(io.BytesIO(b), "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
            - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float array in [-1,1] (n,) or (n, ch) -> 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# feature extraction (the decode+featurize step multimodal.py calls)
# ---------------------------------------------------------------------------


def image_features(b: bytes, dim: int = 16) -> list:
    """PNG -> fixed-dim features: [w, h, ch, mean, std] + a ytile
    grey thumbnail flattened to fill `dim`."""
    arr = decode_png(b)
    h, w, ch = arr.shape
    grey = arr.mean(axis=2)
    side = max(1, int(np.sqrt(max(dim - 5, 1))))
    ys = np.linspace(0, h, side + 1).astype(int)
    xs = np.linspace(0, w, side + 1).astype(int)
    thumb = [
        float(grey[ys[i]:max(ys[i + 1], ys[i] + 1),
                   xs[j]:max(xs[j + 1], xs[j] + 1)].mean()) / 255.0
        for i in range(side)
        for j in range(side)
    ]
    feats = [
        float(w), float(h), float(ch),
        float(arr.mean()) / 255.0, float(arr.std()) / 255.0,
    ] + thumb
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def audio_features(b: bytes, dim: int = 16) -> list:
    """WAV -> fixed-dim features: [rate, n, ch, rms, zero-cross-rate]
    + band energies over `dim-5` equal time slices."""
    x, rate = decode_wav(b)
    mono = x.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    nb = max(dim - 5, 1)
    bands = [
        float(np.sqrt((seg ** 2).mean())) if len(seg) else 0.0
        for seg in np.array_split(mono, nb)
    ]
    feats = [float(rate), float(n), float(x.shape[1]), rms, zcr] + bands
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))
