"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) travels as a ``binary`` column plus a typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` operators so each executor
processes whole record batches without per-row Python overhead.

``codec="real"`` probes IMAGE payloads with the public Pillow package
behind an import guard (``pip install Pillow``; the runtime image does
not ship it, so the integration test skips cleanly when absent),
probes AUDIO payloads with the stdlib ``wave`` module (WAV/RIFF — no
dependency, always real), and raises a descriptive error for video,
which needs an ffmpeg-class stack — plug one in as a callable.
``codec="fake"``
produces deterministic metadata derived from the bytes — the
Spark-side plumbing (schemas, batching, partitioning, UDF signatures)
is real and tested either way.

Integration contract (the "real" codec)
---------------------------------------

``codec`` may also be a **callable** ``(data: bytes|None, kind: str) ->
dict`` returning any subset of ``{"width", "height", "duration_ms"}``
(missing keys default to 0; ``n_bytes`` and ``checksum`` are computed
by the operator). It runs per payload ON THE EXECUTORS inside the
Arrow batch loop, so it must be picklable and lazily initialize codec
handles (import Pillow/ffmpeg inside the callable, not on the
driver)::

    def pil_probe(data, kind):
        if data is None or kind != "image":
            return {}
        import io
        from PIL import Image           # executor-side import
        with Image.open(io.BytesIO(data)) as im:
            return {"width": im.width, "height": im.height}

    meta = decode_media(media, codec=pil_probe)

Payloads are decoded one Arrow batch at a time, so peak memory per
worker is one batch of payloads plus the codec's own buffers —
partition size never enters.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media record schema: payload + sidecar metadata
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image|audio|video
    T.StructField("data", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "duration_ms long, checksum string"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, feature array<float>"


def _real_image_probe(data: "bytes | None", kind: str) -> dict:
    """Pillow header probe for images (``Image.open`` reads only
    metadata until pixel access — cheap even for large payloads);
    import-guarded because the public Pillow package may be absent."""
    if data is None:
        return {}
    import io

    try:
        from PIL import Image
    except ImportError as e:
        raise ImportError(
            "codec='real' uses the public Pillow package, which is not "
            "installed in this runtime (pip install Pillow), or pass a "
            "callable codec to plug in another decoder"
        ) from e
    with Image.open(io.BytesIO(data)) as im:
        return {"width": im.width, "height": im.height}


def _real_audio_probe(data: "bytes | None") -> dict:
    """WAV/RIFF header probe via the stdlib ``wave`` module (no
    third-party dependency): duration from frame count / sample rate.
    Compressed formats (mp3/ogg/flac) raise ``wave.Error`` — plug an
    ffmpeg-class callable codec in for those."""
    if data is None:
        return {}
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate() or 1
        return {"duration_ms": int(w.getnframes() * 1000 / rate)}


def _real_probe(data: "bytes | None", kind: str) -> dict:
    """``codec="real"`` dispatch: Pillow for images, stdlib ``wave``
    for audio (WAV/RIFF). Video needs an ffmpeg-class stack this
    runtime doesn't ship — pass a callable codec."""
    if kind == "image":
        return _real_image_probe(data, kind)
    if kind == "audio":
        return _real_audio_probe(data)
    raise NotImplementedError(
        f"codec='real' decodes image (Pillow) and audio (stdlib wave) "
        f"payloads; {kind!r} needs an ffmpeg-class stack - pass a "
        "callable codec (see module docstring)"
    )


def attach_binary(
    df: DataFrame, payload_col: str, id_col: str, kind: str = "image"
) -> DataFrame:
    """Wrap an existing column as an opaque media payload (demo path:
    any binary/string column becomes ``data``)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("data"),
        F.create_map(F.lit("source"), F.lit(payload_col)).alias("meta"),
    )


def decode_media(
    df: DataFrame,
    codec: "str | Callable[[bytes | None, str], dict]" = "fake",
) -> DataFrame:
    """Decode payloads to typed metadata (dimensions/duration/checksum).

    ``codec="real"`` probes image payloads with the import-guarded
    public Pillow package (see :func:`_real_image_probe`).
    ``codec="fake"`` derives deterministic pseudo-dimensions from the
    payload bytes so the full pipeline is exercisable end-to-end. A
    callable ``codec`` plugs any real decoder in — see the module
    docstring for the contract.
    """
    if not callable(codec) and codec not in ("fake", "real"):
        raise ValueError(
            f"codec must be 'fake', 'real' or a callable, got {codec!r}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def probe(b, kind: str) -> tuple:
            if callable(codec) or codec == "real":
                fn = _real_probe if codec == "real" else codec
                m = fn(b, kind) or {}
                return (
                    int(m.get("width", 0)),
                    int(m.get("height", 0)),
                    int(m.get("duration_ms", 0)),
                )
            # deterministic fake dimensions from the payload bytes
            return (
                16 + (b[0] if b is not None and len(b) else 0),
                16 + (b[-1] if b is not None and len(b) else 0),
                0 if b is None else len(b) * 10,
            )

        for pdf in it:
            probed = [
                probe(b, k) for b, k in zip(pdf["data"], pdf["kind"])
            ]
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else 0),
                "width": [p[0] for p in probed],
                "height": [p[1] for p in probed],
                "duration_ms": [p[2] for p in probed],
                "checksum": pdf["data"].map(
                    lambda b: hashlib.md5(b or b"").hexdigest()
                ),
            })
            yield out

    # Spark cannot see which columns an opaque batch function touches,
    # so every input column would cross the Arrow boundary (and defeat
    # scan pruning) — ship only what the decode reads (guide §4.1);
    # `meta` in particular is a per-row map that decode never looks at
    return df.select("media_id", "kind", "data").mapInPandas(
        batches, DECODED_SCHEMA
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-histogram feature vector per media row (the deterministic
    stand-in for a real embedding model): 16 buckets of byte-value
    counts, L1-normalized. Arrow-batched; output is the same
    ``array<float>`` shape a real encoder would emit, so downstream
    similarity search (llm.similarity) composes unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feat(b: bytes | None) -> list[float]:
            counts = [0] * FEATURE_DIM
            if b:
                for byte in b:
                    counts[byte % FEATURE_DIM] += 1
                total = float(len(b))
                return [c / total for c in counts]
            return [0.0] * FEATURE_DIM

        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": pdf["data"].map(feat),
            })

    # only the id and payload cross the Python boundary (guide §4.1)
    return df.select("media_id", "data").mapInPandas(
        batches, FEATURE_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, data binary, width int, height int, "
    "n_bytes long"
)


def _real_audio_resize(data: "bytes | None", budget: int) -> "bytes | None":
    """WAV downsample via the stdlib ``wave`` + ``audioop`` modules (no
    third-party deps — the resize twin of :func:`_real_audio_probe`,
    closing the r8 probe/resize asymmetry): resample so the payload
    holds at most ``budget`` frames — the audio reading of the
    ``target_w · target_h`` pixel budget — duration-preserving, via
    ``audioop.ratecv`` linear interpolation. Payloads already within
    budget pass through unchanged. Compressed formats (mp3/ogg/flac)
    raise ``wave.Error``; plug an ffmpeg-class callable codec in for
    those. ``audioop`` left the stdlib in Python 3.13 — on such
    runtimes this raises ImportError pointing at the callable-codec
    escape hatch."""
    if data is None:
        return None
    import io
    import wave

    try:
        import audioop
    except ImportError as e:  # pragma: no cover — Python >= 3.13
        raise ImportError(
            "codec='real' audio resize uses the stdlib audioop module "
            "(removed in Python 3.13); pass a callable codec to plug in "
            "an ffmpeg-class resampler"
        ) from e

    with wave.open(io.BytesIO(data), "rb") as r:
        nch, sw = r.getnchannels(), r.getsampwidth()
        rate, nframes = r.getframerate(), r.getnframes()
        frames = r.readframes(nframes)
    if nframes <= budget:
        return data
    new_rate = max(1, (rate * budget) // nframes)
    converted, _ = audioop.ratecv(frames, sw, nch, rate, new_rate, None)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sw)
        w.setframerate(new_rate)
        w.writeframes(converted)
    return buf.getvalue()


def _real_resize(
    data: "bytes | None", kind: str, w: int, h: int
) -> "bytes | None":
    """Pillow-backed image resize (re-encoded as PNG) and stdlib WAV
    audio downsample; video needs an ffmpeg-class stack — pass a
    callable codec."""
    if kind == "audio":
        return _real_audio_resize(data, w * h)
    if kind != "image":
        raise NotImplementedError(
            f"codec='real' resizes images (Pillow) and WAV audio "
            f"(stdlib wave/audioop); {kind!r} payloads need an "
            "ffmpeg-class stack - pass a callable codec"
        )
    if data is None:
        return None
    import io

    try:
        from PIL import Image
    except ImportError as e:
        raise ImportError(
            "codec='real' uses the public Pillow package, which is not "
            "installed in this runtime (pip install Pillow), or pass a "
            "callable codec to plug in another resizer"
        ) from e
    buf = io.BytesIO()
    with Image.open(io.BytesIO(data)) as im:
        im.resize((w, h)).save(buf, format="PNG")
    return buf.getvalue()


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    codec: "str | Callable[[bytes | None, str, int, int], bytes | None]" = "fake",
) -> DataFrame:
    """Resize payloads to a ``target_w × target_h`` budget — the
    thumbnail / model-input normalization step of an image pipeline.

    ``codec="fake"`` truncates the payload to ``target_w · target_h``
    bytes (a deterministic pixel-budget stand-in, so the full Spark
    plumbing — Arrow batching, binary column round-trip, metadata
    columns — runs for real without image libs). ``codec="real"``
    resizes images with the import-guarded public Pillow package. A
    callable ``codec(data, kind, w, h) -> bytes`` plugs in anything
    else; it runs executor-side inside the Arrow batch loop (import
    your codec inside it, not on the driver).

    Output (:data:`RESIZED_SCHEMA`): id, kind, resized ``data``,
    the target dimensions, and the resized byte count. Plan shape:
    mapInPandas only — zero shuffles, peak executor memory is one
    Arrow batch of payloads.
    """
    if not callable(codec) and codec not in ("fake", "real"):
        raise ValueError(
            f"codec must be 'fake', 'real' or a callable, got {codec!r}"
        )
    if target_w < 1 or target_h < 1:
        raise ValueError(
            f"target dimensions must be >= 1, got {target_w}x{target_h}"
        )
    budget = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rs(b, kind: str) -> "bytes | None":
            if callable(codec):
                return codec(b, kind, target_w, target_h)
            if codec == "real":
                return _real_resize(b, kind, target_w, target_h)
            return None if b is None else bytes(b[:budget])

        for pdf in it:
            out = [rs(b, k) for b, k in zip(pdf["data"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "data": out,
                "width": target_w,
                "height": target_h,
                "n_bytes": [len(b) if b is not None else 0 for b in out],
            })

    # only what the resize reads crosses the boundary (guide §4.1)
    return df.select("media_id", "kind", "data").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled "frame" (every_n_bytes stride over the payload — where a
    real pipeline would seek keyframes). Demonstrates the 1->N
    mapInPandas expansion shape with bounded batch memory."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ix, frames = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None:
                    continue
                for f, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(mid)
                    ix.append(f)
                    frames.append(bytes(data[off : off + every_n_bytes]))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_ix": pd.Series(ix, dtype="int32"),
                "frame": frames,
            })

    # only the id and payload cross the Python boundary (guide §4.1)
    return df.select("media_id", "data").mapInPandas(
        batches, "media_id long, frame_ix int, frame binary"
    )
