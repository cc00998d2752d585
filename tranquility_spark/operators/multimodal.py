"""Multimodal column conventions (north-star phase 4).

Convention: media payloads ride as opaque ``binary`` columns with a typed
metadata struct alongside (``media_type``, byte size, per-type fields). The
decode / feature-extract step runs as an Arrow-batched ``mapInPandas`` so one
Python worker call processes a whole batch of blobs.

The decode slot is pluggable (``impl=``), with three bindings per operator
(VERDICT r07 #4 — same mapInPandas interface, same output schema for all):

- ``"stub"`` (default): deterministic fake decode — oracle-checkable, used
  by the catalog entries, exercises the exact plumbing (binary schema, UDF
  signature, Arrow batch iteration, fan-out shape) a real decoder uses.
- ``"native"``: REAL pure-stdlib codecs (``operators/codecs.py``): PNG via
  zlib + full unfiltering, 24-bit BMP, 8/16-bit PCM WAV via ``wave`` —
  real bytes decode to real pixels/samples with zero optional deps.
- ``"pil"`` / ``"soundfile"``: the full-format production binding. Gated
  behind an import-try AT OPERATOR BUILD TIME: when the lib is absent the
  operator raises a clear RuntimeError on the driver (naming the package
  and the native/stub fallbacks) instead of failing inside executors.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKSUM_MOD = 1000000007


def _require_lib(module: str, package: str, impl: str) -> None:
    """Driver-side gate for optional codec libs: fail fast and clearly."""
    import importlib

    try:
        importlib.import_module(module)
    except ImportError as exc:
        raise RuntimeError(
            f"impl={impl!r} needs the {package!r} package, which is not "
            f"installed in this environment — install it, or use "
            f"impl='native' (pure-stdlib PNG/BMP/WAV codecs) or the default "
            f"impl='stub' (deterministic fake decode)"
        ) from exc


def _check_impl(impl: str, allowed: tuple) -> None:
    if impl not in allowed:
        raise ValueError(f"impl must be one of {allowed}, got {impl!r}")

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, width int, height int, checksum bigint"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build the multimodal convention from the documents table: the utf-8
    bytes of ``text`` stand in for a real media blob."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_image_features(
    media_df: DataFrame, id_col: str = "doc_id", impl: str = "stub"
) -> DataFrame:
    """Decode each payload to (width, height, checksum) via mapInPandas.

    ``impl="stub"`` (default, oracle-checked): deterministic fake dimensions
    from the byte length and a bytewise checksum over the PAYLOAD — keeps
    the exact plumbing (Arrow batches in, struct rows out) a real decoder
    uses. ``impl="native"``: real PNG/BMP decode (``codecs.py``) — width and
    height are the true image dimensions and the checksum is over the
    decoded PIXELS. ``impl="pil"``: pillow decode (any format pillow
    reads), same pixel-checksum convention; clear driver-side error when
    pillow is absent.
    """
    _check_impl(impl, ("stub", "native", "pil"))
    if impl == "pil":
        _require_lib("PIL", "pillow", impl)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        if impl == "native":
            from tranquility_spark.operators.codecs import decode_image

            def one(b):
                w, h, _ch, pixels = decode_image(bytes(b))
                return w, h, sum(pixels) % _CHECKSUM_MOD

        elif impl == "pil":
            import io

            from PIL import Image

            def one(b):
                img = Image.open(io.BytesIO(bytes(b)))
                pixels = img.tobytes()
                return img.width, img.height, sum(pixels) % _CHECKSUM_MOD

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            if impl == "stub":
                width, height = n_bytes % 640, (n_bytes * 7) % 480
                checksum = payloads.map(lambda b: sum(b) % _CHECKSUM_MOD)
            else:
                decoded = payloads.map(one)
                width = decoded.map(lambda t: t[0])
                height = decoded.map(lambda t: t[1])
                checksum = decoded.map(lambda t: t[2])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_meta"].map(lambda m: m["media_type"]),
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "checksum": checksum,
                }
            )

    return media_df.mapInPandas(decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, width int, height int, payload binary"


def resize_images(
    media_df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    id_col: str = "doc_id",
    impl: str = "stub",
) -> DataFrame:
    """Resize every image payload to (target_width, target_height).

    ``impl="stub"`` (default, oracle-checked): truncates/tiles the payload
    to ``target_width * target_height`` bytes so output size, schema, and
    batch shape match a real resizer. ``impl="native"``: real decode
    (PNG/BMP) → nearest-neighbor resample → PNG re-encode, pure stdlib.
    ``impl="pil"``: pillow decode → ``img.resize`` → PNG re-encode; clear
    driver-side error when pillow is absent. The Spark plan is identical
    for every impl: one narrow mapInPandas, no shuffle, scales linearly
    with executors.
    """
    _check_impl(impl, ("stub", "native", "pil"))
    if impl == "pil":
        _require_lib("PIL", "pillow", impl)
    n_out = target_width * target_height

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        if impl == "native":
            from tranquility_spark.operators.codecs import (
                decode_image,
                nearest_resize,
                png_encode,
            )

            def one(b):
                w, h, ch, pixels = decode_image(bytes(b))
                return png_encode(
                    nearest_resize(pixels, w, h, ch, target_width, target_height),
                    target_width,
                    target_height,
                    ch,
                )

        elif impl == "pil":
            import io

            from PIL import Image

            def one(b):
                img = Image.open(io.BytesIO(bytes(b))).resize(
                    (target_width, target_height), resample=Image.NEAREST
                )
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()

        for pdf in batches:
            if impl == "stub":
                out_payload = pdf["payload"].map(
                    lambda b: (b * (n_out // max(len(b), 1) + 1))[:n_out]
                )
            else:
                out_payload = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": target_width,
                    "height": target_height,
                    "payload": out_payload,
                }
            )

    return media_df.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms int, payload binary"


def sample_frames(
    media_df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample frames from each 'video' payload — a 1→N row fan-out.

    STUB: a real implementation would demux with pyav/ffmpeg per batch. The
    fake treats the payload as ``duration_ms = 100 * n_bytes % 60000`` and
    emits one byte-slice per sampled timestamp. What IS real: the fan-out
    shape (mapInPandas may return more rows than it consumed — this is how
    frame extraction distributes), the typed frame schema, and the bounded
    ``max_frames`` guard that keeps worst-case row amplification explicit.
    """

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "payload": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                duration_ms = (100 * len(payload)) % 60000
                n = min(max(duration_ms // every_ms, 1), max_frames)
                for i in range(int(n)):
                    ts = i * every_ms
                    lo = (ts * 13) % max(len(payload) - 16, 1)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(ts)
                    rows["payload"].append(payload[lo : lo + 16])
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(frames, schema=FRAMES_SCHEMA)


AUDIO_FRAME_SCHEMA = (
    "doc_id bigint, frame_id bigint, n_samples int, energy bigint, "
    "peak int, is_silence bigint"
)

FRAME = 256
HOP = 128
# mean-square threshold for the silence flag (integer contract:
# energy < SILENCE_MS * n_samples — no float division anywhere)
SILENCE_MS = 1500


def audio_frame_energy(
    media_df: DataFrame,
    id_col: str = "doc_id",
    frame: int = FRAME,
    hop: int = HOP,
    silence_ms: int = SILENCE_MS,
    impl: str = "stub",
) -> DataFrame:
    """Audio-modality plumbing: frame-level energy / peak / silence flags.

    The decode step is pluggable; everything downstream of it —
    sliding-window framing, per-frame sum-of-squares energy, peak
    deviation, integer silence thresholding — is the SAME DSP code for
    every impl, Arrow-batched through mapInPandas with a 1→N fan-out
    exactly like ``sample_frames``.

    ``impl="stub"`` (default, oracle-checked): each payload byte stands in
    for an unsigned 8-bit sample centered at 128. ``impl="native"``: real
    8/16-bit PCM WAV demux via stdlib ``wave`` (``codecs.wav_decode``) to
    centered integer samples. ``impl="soundfile"``: libsndfile formats via
    the soundfile package, decoded as 16-bit integer samples by libsndfile
    itself (``dtype="int16"`` — 16-bit PCM inputs are bit-exact vs
    ``impl="native"``; other subtypes use libsndfile's own conversion);
    clear driver-side error when the lib is absent.

    All arithmetic is INTEGER (sum of squared deviations; the silence test
    multiplies instead of dividing), so every path is exactly reproducible.
    Full windows only: a payload shorter than one frame emits no rows.
    Scale: no shuffle — each blob frames independently; cost is linear in
    corpus bytes. NOTE: the default ``silence_ms`` threshold is scaled to
    8-bit sample deviations; 16-bit audio callers should pass a threshold
    matched to their amplitude scale.
    """
    _check_impl(impl, ("stub", "native", "soundfile"))
    if impl == "soundfile":
        _require_lib("soundfile", "soundfile", impl)

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        if impl == "native":
            from tranquility_spark.operators.codecs import wav_decode

            def decode(payload):
                _rate, samples = wav_decode(bytes(payload))
                return samples

        elif impl == "soundfile":
            import io

            import soundfile as sf

            def decode(payload):
                # dtype="int16" makes libsndfile itself emit integer
                # samples: 16-bit PCM decodes bit-exactly to
                # impl="native"'s values with no float round-trip. The
                # earlier float read scaled by 32767 and TRUNCATED via
                # astype — up to 1 LSB off a PCM decode of the same
                # audio, enough to flip energy/silence flags near
                # thresholds (ADVICE r8).
                data = sf.read(
                    io.BytesIO(bytes(payload)), always_2d=True, dtype="int16"
                )[0]
                return data[:, 0].astype(np.int64)

        else:

            def decode(payload):
                return (
                    np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                    - 128
                )

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_id": [],
                "n_samples": [],
                "energy": [],
                "peak": [],
                "is_silence": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                dev = decode(payload)
                n = len(dev)
                if n < frame:
                    continue
                for fid in range((n - frame) // hop + 1):
                    w = dev[fid * hop : fid * hop + frame]
                    energy = int(np.dot(w, w))
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(fid)
                    out["n_samples"].append(frame)
                    out["energy"].append(energy)
                    out["peak"].append(int(np.abs(w).max()))
                    out["is_silence"].append(
                        1 if energy < silence_ms * frame else 0
                    )
            yield pd.DataFrame(out)

    return media_df.mapInPandas(frames, schema=AUDIO_FRAME_SCHEMA)


DHASH_SCHEMA = "doc_id bigint, dhash string"


def image_dhash(
    media_df: DataFrame,
    id_col: str = "doc_id",
    impl: str = "stub",
) -> DataFrame:
    """Perceptual difference hash (dHash, 64-bit) per image payload — the
    image-modality near-dup signal: two images within a few hamming bits
    of each other are visual duplicates (crops/re-encodes of one source),
    the exact counterpart of MinHash for text.

    The 9x8 grayscale reduction + horizontal-gradient bits are the public
    dHash recipe: bit (r, c) = 1 iff px[r][c+1] > px[r][c], one byte per
    row, emitted as 16 lowercase hex chars (a STRING, not a BIGINT — the
    cross-engine bit policy forbids packing into bit 63, and hex digests
    survive the driver's value-hash while 64-bit ints with the sign bit
    set would not).

    ``impl="stub"`` (default, oracle-checked): the 9x8 'grayscale' is the
    payload tiled/truncated to 72 bytes — mm3's stub formula at 9x8 — so
    every gradient bit is byte-exact SQL-replicable (the mm4 hex-digit
    technique). ``impl="native"``: real PNG/BMP decode → nearest resize
    to 9x8 → integer channel-mean grayscale (sum // ch). ``impl="pil"``:
    pillow's convert('L') + NEAREST resize; import-gated. Same Spark plan
    for every impl: one narrow mapInPandas, no shuffle.
    """
    _check_impl(impl, ("stub", "native", "pil"))
    if impl == "pil":
        _require_lib("PIL", "pillow", impl)

    def hashes(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        if impl == "native":
            from tranquility_spark.operators.codecs import (
                decode_image,
                nearest_resize,
            )

            def gray72(b):
                w, h, ch, pixels = decode_image(bytes(b))
                small = nearest_resize(pixels, w, h, ch, 9, 8)
                return [
                    sum(small[i * ch + k] for k in range(ch)) // ch
                    for i in range(72)
                ]

        elif impl == "pil":
            import io

            from PIL import Image

            def gray72(b):
                img = (
                    Image.open(io.BytesIO(bytes(b)))
                    .convert("L")
                    .resize((9, 8), resample=Image.NEAREST)
                )
                return list(img.getdata())

        else:

            def gray72(b):
                b = bytes(b)
                return list((b * (72 // max(len(b), 1) + 1))[:72])

        def dhash(b):
            # corrupt-payload accounting (ADVICE r9): an empty or
            # undecodable blob must yield a NULL dhash, not an
            # IndexError/decode exception that kills the whole
            # mapInPandas batch — the p10 wire-parser contract
            if b is None or len(bytes(b)) == 0:
                return None
            try:
                px = gray72(b)
            except Exception:
                return None  # undecodable image (impl="native"/"pil")
            if len(px) < 72:
                return None
            out = []
            for r in range(8):
                byte = 0
                for c in range(8):
                    if px[r * 9 + c + 1] > px[r * 9 + c]:
                        byte |= 1 << c
                out.append(byte)
            return "".join(f"{v:02x}" for v in out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "dhash": pdf["payload"].map(dhash),
                }
            )

    return media_df.mapInPandas(hashes, schema=DHASH_SCHEMA)


AUDIO_FP_SCHEMA = "doc_id bigint, afp string"

# fingerprint geometry: 65 segments x 8 samples = 520-sample analysis
# window; 64 adjacent-segment comparisons pack into 8 bytes = 16 hex chars
AFP_SEGMENTS = 65
AFP_SEG_SAMPLES = 8


def audio_energy_fingerprint(
    media_df: DataFrame,
    id_col: str = "doc_id",
    impl: str = "stub",
    seg_samples: int = AFP_SEG_SAMPLES,
    n_segments: int = AFP_SEGMENTS,
) -> DataFrame:
    """Energy-delta audio fingerprint (64-bit, 16 lowercase hex chars) per
    audio payload — the AUDIO-modality near-dup signal, the exact
    counterpart of ``image_dhash`` for sound: two clips within a few
    hamming bits are re-encodes/trims of one source. The recipe is the
    public energy-difference fingerprint family (Haitsma-Kalker-style
    sign-of-delta bits over a coarse energy envelope, reduced to ONE
    band): the centered integer samples are tiled/truncated to a FIXED
    ``seg_samples * n_segments``-sample analysis window (fixed framing —
    length-normalized segment boundaries lose alignment between near-dup
    payloads the way unaligned dHash grids would), the per-segment
    sum-of-squares energies form the envelope, and bit (r, c) = 1 iff
    ``energy[r*8+c+1] > energy[r*8+c]`` — byte packing identical to
    ``image_dhash``, so the digest drops straight into the 4 x 16-bit
    hamming-banding machinery (``dedup.audio_fp_neardup_pairs``).

    Like mm4 and unlike every other signature family, ALL arithmetic is
    integer (sum of squared deviations, strict > comparisons), so the
    default impl is exactly SQL-replicable: dd25/dd26/dd27's DuckDB
    oracles recompute the fingerprint AND the brute-force hamming pair
    set from the raw bytes — cross-engine hash-certified near-dup, not
    just an equality twin.

    ``impl="stub"`` (default, oracle-checked): payload bytes stand in
    for unsigned 8-bit samples centered at 128 (``audio_frame_energy``'s
    stub convention). ``impl="native"``: real 8/16-bit PCM WAV demux via
    stdlib ``wave`` (``codecs.wav_decode``) to centered integer samples.
    ``impl="soundfile"``: libsndfile decode as int16; import-gated.
    Empty or undecodable payloads yield a NULL fingerprint (the
    ``image_dhash`` dead-letter verdict — never a per-row exception).
    Same Spark plan for every impl: one narrow mapInPandas, no shuffle;
    cost linear in corpus bytes, paid once when the digests are
    persisted (``dedup.audio_fp_index_write``).
    """
    _check_impl(impl, ("stub", "native", "soundfile"))
    if impl == "soundfile":
        _require_lib("soundfile", "soundfile", impl)
    total = seg_samples * n_segments
    if n_segments % 8 != 1:
        raise ValueError(
            "n_segments must be 8*k+1 (k bytes of adjacent-comparison "
            f"bits); got {n_segments}"
        )
    # ADVICE r15 #1: only the default 65-segment geometry yields the
    # 16-hex-char 64-bit digest the audio_fp_* banding pipeline assumes
    # (a wider digest, e.g. n_segments=129 -> 32 hex chars, would band
    # only its first 64 bits). The shared banding machinery now guards
    # digest width loudly (dedup._guard_hex16), so a mismatched geometry
    # fails the downstream job instead of silently losing recall; wider
    # digests remain valid for exact-equality consumers.

    def fps(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        if impl == "native":
            from tranquility_spark.operators.codecs import wav_decode

            def decode(payload):
                _rate, samples = wav_decode(bytes(payload))
                return samples

        elif impl == "soundfile":
            import io

            import soundfile as sf

            def decode(payload):
                data = sf.read(
                    io.BytesIO(bytes(payload)), always_2d=True, dtype="int16"
                )[0]
                return data[:, 0].astype(np.int64)

        else:

            def decode(payload):
                return (
                    np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                    - 128
                )

        n_bytes = (n_segments - 1) // 8

        def fingerprint(payload):
            if payload is None or len(bytes(payload)) == 0:
                return None
            try:
                dev = decode(payload)
            except Exception:
                return None  # undecodable audio (impl="native"/"soundfile")
            n = len(dev)
            if n == 0:
                return None
            t = np.tile(dev, total // n + 1)[:total]
            e = (t * t).reshape(n_segments, seg_samples).sum(axis=1)
            bits = e[1:] > e[:-1]
            out = []
            for r in range(n_bytes):
                byte = 0
                for c in range(8):
                    if bits[r * 8 + c]:
                        byte |= 1 << c
                out.append(byte)
            return "".join(f"{v:02x}" for v in out)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "afp": pdf["payload"].map(fingerprint),
                }
            )

    return media_df.mapInPandas(fps, schema=AUDIO_FP_SCHEMA)


VIDEO_FHASH_SCHEMA = "doc_id bigint, frame_idx bigint, fhash string"


def video_frame_hashes(
    media_df: DataFrame,
    id_col: str = "doc_id",
    every_ms: int = 1000,
    max_frames: int = 8,
    impl: str = "stub",
) -> DataFrame:
    """Per-frame perceptual digests for each 'video' payload — the
    signature pass of the VIDEO-modality near-dup family (dd28-dd30):
    two videos sharing >= min_shared distinct frame digests are copies /
    re-encodes / clips of one source (the public content-based
    video-retrieval recipe: frame fingerprints + inverted-index
    containment — one digest per sampled frame, NOT one per video,
    because clipping shifts global signatures but preserves frames).

    ONE mapInPandas fuses ``sample_frames``'s demux fan-out with
    ``image_dhash``'s per-frame digest (two separate passes would pay the
    Arrow round trip twice); the 1-to-N row fan-out, typed schema, and
    bounded ``max_frames`` amplification guard are sample_frames'
    contract verbatim. The frame-sampling formula and the tile-to-72
    gradient digest are INLINED copies of sample_frames'/image_dhash's
    stub recipes on purpose (the _dd_new_batch precedent: those feed
    certified entries mm3/mm6 whose behavior must not rotate for a new
    family; the formulas are pinned against each other in tests).

    ``impl="stub"`` (default, oracle-checked): fake demux — duration
    from byte length, one 16-byte slice per sampled timestamp, digest =
    the slice tiled to 72 'pixels' through the 9x8 gradient-bit recipe.
    A real pyav/ffmpeg demux (no such lib in this environment) would
    replace ONLY the bytes-to-frame step; sampling cadence, digest
    recipe, fan-out shape, and everything downstream (banding, serving,
    incremental) are impl-independent. Zero-length frame slices (empty
    payloads) dead-letter to a NULL fhash row, never an exception."""
    _check_impl(impl, ("stub",))

    def hashes(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def dhash72(b: bytes):
            if len(b) == 0:
                return None
            px = list((b * (72 // max(len(b), 1) + 1))[:72])
            out = []
            for r in range(8):
                byte = 0
                for c in range(8):
                    if px[r * 9 + c + 1] > px[r * 9 + c]:
                        byte |= 1 << c
                out.append(byte)
            return "".join(f"{v:02x}" for v in out)

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "fhash": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    # NULL payload dead-letters like every sibling
                    # signature operator (image_dhash's None guard): one
                    # NULL-digest row, never a worker TypeError
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(0)
                    rows["fhash"].append(None)
                    continue
                payload = bytes(payload)
                duration_ms = (100 * len(payload)) % 60000
                n = min(max(duration_ms // every_ms, 1), max_frames)
                for i in range(int(n)):
                    lo = (i * every_ms * 13) % max(len(payload) - 16, 1)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["fhash"].append(dhash72(payload[lo : lo + 16]))
            yield pd.DataFrame(rows)

    return media_df.mapInPandas(hashes, schema=VIDEO_FHASH_SCHEMA)
