"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
mapInPandas operators.

The Spark-side machinery (schemas, partitioning, UDF signatures,
batch shapes) is real and tested.  Decoding is layered: PIL /
soundfile are tried first (optional imports, any container format);
PNG and integer-PCM WAV payloads then decode through the pure-stdlib
codecs in ``kernels.media_codecs`` (zlib inflate + numpy scanline
unfiltering / ``wave`` + frombuffer), so real bytes decode end-to-end
even in environments without media libraries.  Only a payload that no
available path can parse falls back to a deterministic fake with the
correct output shape — or, under strict mode, fails the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id string, width int, height int, "
    "mean_intensity double, feature array<float>"
)

AUDIO_FEATURE_SCHEMA = (
    "media_id string, sample_rate int, duration_s double, "
    "rms double, dominant_hz double"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame binary"


def _decode_image(payload: bytes, width: int, height: int, strict: bool):
    """Decode an image payload to a grayscale uint8 (height, width)
    array.  Tries PIL first (optional import, any container format);
    PNG payloads then decode through the pure-stdlib codec
    (``kernels.media_codecs.decode_png_gray`` — zlib inflate + numpy
    scanline unfiltering), so strict mode decodes real bytes even in
    environments without image libraries.  Only a payload that is
    neither PIL-parseable nor a supported PNG falls back to the
    deterministic fake (payload bytes tiled to (height, width)) — or
    raises under ``strict``."""
    import numpy as np

    from peakmatch_xcorr_spark.kernels import media_codecs as mc

    try:
        import io

        from PIL import Image  # optional dependency
    except ImportError:
        pass
    else:
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("L"), dtype=np.uint8)
        except Exception:
            if strict and not mc.is_png(payload):
                raise
    if mc.is_png(payload):
        # broad except: a corrupt IDAT raises zlib.error and a
        # truncated chunk header raises struct.error, not just
        # ValueError — lax mode must fall back on all of them
        try:
            return mc.decode_png_gray(payload)
        except Exception:
            if strict:
                raise
    elif strict:
        raise NotImplementedError(
            "strict image decode: payload is not a PNG (stdlib codec) "
            "and no image library (PIL) is installed for other formats"
        )
    raw = np.frombuffer(payload, dtype=np.uint8)
    if len(raw) == 0:
        raw = np.zeros(1, dtype=np.uint8)
    return np.resize(raw, (height, width))


def _decode_audio(payload: bytes, sample_rate: int, strict: bool):
    """Decode an audio payload to float64 samples in [-1, 1].  Tries
    soundfile first (optional import); when absent or the payload is
    not a parseable audio container, falls back to the deterministic
    fake (payload bytes as int8 PCM) unless ``strict``."""
    import numpy as np

    from peakmatch_xcorr_spark.kernels import media_codecs as mc

    try:
        import io

        import soundfile  # optional dependency
    except ImportError:
        pass
    else:
        try:
            data, _ = soundfile.read(io.BytesIO(payload), dtype="float64")
            return data[:, 0] if getattr(data, "ndim", 1) > 1 else data
        except Exception:
            if strict and not mc.is_wav(payload):
                raise
    # pure-stdlib WAV PCM path (kernels.media_codecs): real decoding
    # without soundfile for the one format the stdlib covers
    if mc.is_wav(payload):
        try:
            sig, _sr = mc.decode_wav(payload)
            return sig
        except Exception:
            if strict:
                raise
    elif strict:
        raise NotImplementedError(
            "strict audio decode: payload is not an integer-PCM WAV "
            "(stdlib codec) and no audio library (soundfile) is "
            "installed for other formats"
        )
    raw = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
    return raw / 128.0


def image_features(
    media: DataFrame, feature_dim: int = 16, strict: bool = False
) -> DataFrame:
    """Decode → downsample-pool a fixed-dim feature vector per image.
    Arrow batches in/out; numpy pooling inside."""

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            rows = {"media_id": [], "width": [], "height": [],
                    "mean_intensity": [], "feature": []}
            for r in pdf.itertuples():
                img = _decode_image(bytes(r.payload), r.width, r.height, strict)
                pooled = np.resize(img.astype(np.float32), (feature_dim,))
                rows["media_id"].append(r.media_id)
                rows["width"].append(r.width)
                rows["height"].append(r.height)
                rows["mean_intensity"].append(float(img.mean()))
                # pyarrow can't build array<float> cells from ndarray
                # objects (NumPyConverter limitation) — plain lists only.
                rows["feature"].append((pooled / 255.0).tolist())
            # never yield an empty frame: pandas types an empty
            # "feature" column float64, and pyarrow can't convert an
            # empty float64 ndarray to array<float> (partitions with
            # no image rows crash the whole job otherwise)
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode → RMS + dominant frequency (reusing the engine's
    spectral kernel — the reference's FFTDOMINANTFREQ path applied to
    an audio payload)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from peakmatch_xcorr_spark.config import SpectralConf
        from peakmatch_xcorr_spark.kernels.spectral import dominant_frequencies

        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            rows = {"media_id": [], "sample_rate": [], "duration_s": [],
                    "rms": [], "dominant_hz": []}
            for r in pdf.itertuples():
                sig = _decode_audio(bytes(r.payload), r.sample_rate, strict)
                sr = int(r.sample_rate)
                conf = SpectralConf(
                    sample_rate=sr, filter_below_hz=0.0,
                    filter_above_hz=sr / 2.0,
                )
                if len(sig) >= 8:
                    top, *_ = dominant_frequencies(sig, conf)
                    dom = float(top[0]) if len(top) else float("nan")
                else:
                    dom = float("nan")
                rows["media_id"].append(r.media_id)
                rows["sample_rate"].append(sr)
                rows["duration_s"].append(len(sig) / sr if sr else float("nan"))
                rows["rms"].append(float(np.sqrt((sig**2).mean())) if len(sig) else 0.0)
                rows["dominant_hz"].append(dom)
            if rows["media_id"]:  # see image_features: no empty frames
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: emit every Nth frame's byte
    slice as its own row (payload treated as concatenated fixed-size
    frames per metadata; decode stubbed the same way)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for r in pdf.itertuples():
                n = int(r.n_frames or 0)
                payload = bytes(r.payload)
                fsize = max(1, len(payload) // max(n, 1))
                for i in range(0, n, every_n):
                    rows["media_id"].append(r.media_id)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(payload[i * fsize : (i + 1) * fsize])
            if rows["media_id"]:  # see image_features: no empty frames
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def synth_media(
    spark, n: int = 24, seed: int = 13, containers: bool = True
) -> DataFrame:
    """Deterministic media table for plumbing tests.  With
    ``containers`` (default) image/audio payloads are REAL encoded
    PNG / 16-bit-PCM WAV bytes (stdlib codecs), so the decode path is
    exercised end-to-end in-sandbox; ``containers=False`` keeps the
    raw-byte payloads that strict mode must refuse."""
    import numpy as np
    import pandas as pd

    from peakmatch_xcorr_spark.kernels import media_codecs as mc

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h, sr, nf = 16, 12, 0, 0
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            payload = mc.encode_png_gray(img) if containers else img.tobytes()
        elif kind == "audio":
            w = h = 0
            sr, nf = 8000, 0
            pcm = rng.integers(-128, 128, 4000, dtype=np.int8)
            payload = (
                mc.encode_wav_pcm16(pcm.astype(np.float64) / 128.0, sr)
                if containers else pcm.tobytes()
            )
        else:
            w, h, sr = 8, 8, 0
            nf = 30
            payload = rng.integers(0, 256, 8 * 8 * nf, dtype=np.uint8).tobytes()
        rows.append(
            {"media_id": f"m{i:04d}", "kind": kind, "payload": payload,
             "width": w, "height": h, "sample_rate": sr, "n_frames": nf}
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
