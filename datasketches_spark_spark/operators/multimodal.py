"""Multimodal column handling — opaque binary payloads + typed metadata.

The LLM-pipeline pattern for image/audio/video at 100 TB: the asset is an
opaque ``binary`` column with a typed metadata struct beside it; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each partition
streams its payloads through Python once, and everything downstream of the
extracted features is ordinary JVM-side relational work.

Decode is REAL via the pure-Python/numpy codecs: images through
``imagecodec`` (PPM/PGM, BI_RGB BMP, baseline+progressive JPEG, 8-bit
PNG, GIF), audio through ``audiocodec`` (RIFF/WAVE PCM/float, FLAC),
video frames through ``avicodec`` (Motion-JPEG AVI) and ``h264codec``
(raw Annex B H.264, I_PCM keyframe subset — r17). Formats beyond
those stay honestly stubbed:
``decode_payload`` raises ``NotImplementedError`` unless a codec
callback is injected, and ``extract_features`` falls back to a
deterministic byte-level featurizer (length, checksum, byte histogram
stats) so the Spark-side plumbing — schema, batching, partitioning, UDF
signature — is real and tested end-to-end for every format class.
"""

from __future__ import annotations

import struct
import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def with_payload(df: DataFrame, content_col: str, modality: str = "text",
                 payload_col: str = "payload",
                 meta_col: str = "meta") -> DataFrame:
    """Attach an opaque binary payload + metadata struct. For the fixture
    tables the payload is the UTF-8 encoding of a text column (a
    deterministic stand-in for image/audio bytes); with real assets the
    binary column arrives from the source as-is."""
    payload = F.encode(F.col(content_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.length(payload).alias("num_bytes"),
        F.lit("utf-8").alias("codec"),
    )
    return df.withColumn(payload_col, payload).withColumn(meta_col, meta)


def decode_payload(payload: bytes, modality: str,
                   codec: Callable[[bytes], object] | None = None):
    """Decode one payload. Image formats with a built-in codec
    (PPM/PGM, BMP, JPEG incl. progressive, 8-bit PNG, GIF) decode via
    ``operators.imagecodec``; anything else needs an injected ``codec``
    or raises ``NotImplementedError`` (clearly-marked stub per the
    build contract)."""
    if codec is not None:
        return codec(payload)
    from .imagecodec import decode_image
    try:
        return decode_image(payload)
    except NotImplementedError as e:
        raise NotImplementedError(
            f"modality={modality!r}: {e}; install/inject a decoder "
            "(e.g. PIL for images) and pass it as `codec`") from None


FEATURE_SCHEMA_FIELDS = [
    StructField("num_bytes", LongType()),
    StructField("checksum", LongType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_entropy", DoubleType()),
]


def transform_payloads(df: DataFrame, id_col: str, transform,
                       out_fields: list[StructField],
                       payload_col: str = "payload",
                       keep_cols: list[str] | None = None) -> DataFrame:
    """Generic streaming payload transform (one Arrow-batched pass per
    partition): ``transform(payload: bytes) -> dict`` matching
    ``out_fields``. The plumbing for decode/resize/frame-sample style
    operators — swap in a real codec-backed transform at deploy time.

    ``keep_cols`` carries narrow columns through the Python stage
    unchanged — at scale that replaces a join-back-to-source (a second
    scan plus a shuffle) with a few extra bytes per Arrow row."""
    keep = list(keep_cols or [])
    src = df.select(F.col(id_col).alias("_id"),
                    F.col(payload_col).alias("_p"), *keep)
    out_schema = StructType(
        [StructField("_id", src.schema["_id"].dataType)]
        + [src.schema[c] for c in keep] + out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # per-BATCH memo on payload bytes (r18, guide §4.2):
            # `transform` is a pure function of the payload, and real
            # corpora (re-crawls, mirrored assets) as well as the gate
            # fixtures carry many byte-identical payloads — decode each
            # distinct payload once per batch. The cache dies with the
            # batch, so memory is bounded by the batch's distinct
            # payload results and nothing persists across tasks or runs.
            cache: dict = {}
            rows = []
            for i, raw in enumerate(pdf["_p"]):
                if raw is None:
                    continue
                key = bytes(raw)
                res = cache.get(key)
                if res is None:
                    res = cache[key] = transform(key)
                row = {"_id": pdf["_id"].iloc[i]}
                for c in keep:
                    row[c] = pdf[c].iloc[i]
                row.update(res)
                rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    return src.mapInPandas(run, out_schema).withColumnRenamed("_id", id_col)


RESIZE_FIELDS = [
    StructField("payload", BinaryType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
]


def resize_images(df: DataFrame, id_col: str, width: int, height: int,
                  payload_col: str = "payload",
                  codec: Callable[[bytes], object] | None = None,
                  resizer: Callable[[object, int, int], bytes] | None = None,
                  keep_cols: list[str] | None = None) -> DataFrame:
    """Image resize over opaque payloads. Uncompressed payloads (PPM/PGM,
    BI_RGB BMP) take a REAL path: pure-numpy decode -> nearest-neighbor
    resample -> re-encode in the same container. Compressed formats need
    an injected ``codec``+``resizer`` (no image libraries here); without
    one they fall back to a deterministic fake — truncating/cycling the
    byte stream to width*height bytes — so the Spark-side schema,
    batching and output contract stay testable end-to-end either way."""
    from .imagecodec import (decode_image, encode_bmp, encode_ppm,
                             resize_nearest, sniff_format)

    def one(raw: bytes) -> dict:
        if codec is not None and resizer is not None:
            out = resizer(decode_payload(raw, "image", codec), width, height)
        else:
            fmt = sniff_format(raw)
            if fmt in ("ppm", "bmp"):
                img = resize_nearest(decode_image(raw), width, height)
                out = encode_ppm(img) if fmt == "ppm" else encode_bmp(img)
            else:
                need = width * height
                reps = (need // max(len(raw), 1)) + 1
                out = (raw * reps)[:need]
        return {"payload": out, "width": width, "height": height}

    return transform_payloads(df, id_col, one, RESIZE_FIELDS,
                              payload_col=payload_col, keep_cols=keep_cols)


IMAGE_FEATURE_FIELDS = [
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("channels", LongType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
]


AUDIO_FEATURE_FIELDS = [
    StructField("n_frames", LongType()),
    StructField("n_channels", LongType()),
    StructField("sample_rate", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("peak", DoubleType()),
    StructField("zero_cross_rate", DoubleType()),
]


def extract_audio_features(df: DataFrame, id_col: str,
                           payload_col: str = "payload",
                           keep_cols: list[str] | None = None) -> DataFrame:
    """Decoded-sample features (duration/RMS/peak/zero-cross rate) for
    audio payloads, one streaming Arrow pass per partition
    (``operators.audiocodec``): RIFF/WAVE PCM/float and FLAC decode for
    real; other compressed audio raises — filter upstream, don't
    silently drop assets."""
    from .audiocodec import audio_features, decode_audio

    def one(raw: bytes) -> dict:
        return audio_features(*decode_audio(raw))

    return transform_payloads(df, id_col, one, AUDIO_FEATURE_FIELDS,
                              payload_col=payload_col, keep_cols=keep_cols)


def extract_image_features(df: DataFrame, id_col: str,
                           payload_col: str = "payload",
                           keep_cols: list[str] | None = None) -> DataFrame:
    """Decoded-pixel features (dimensions + channel means) for
    uncompressed image payloads, one streaming Arrow pass per partition.
    Payloads the built-in codec cannot decode surface the error (don't
    silently drop assets at 100 TB — filter upstream on
    ``sniff_format``-able metadata instead)."""
    from .imagecodec import decode_image, image_features
    return transform_payloads(
        df, id_col, lambda raw: image_features(decode_image(raw)),
        IMAGE_FEATURE_FIELDS, payload_col=payload_col,
        keep_cols=keep_cols)


PHASH_FIELDS = [StructField("phash", StringType())]


def perceptual_hash_images(df: DataFrame, id_col: str,
                           payload_col: str = "payload",
                           grid: int = 8,
                           keep_cols: list[str] | None = None) -> DataFrame:
    """Perceptual average-hash per image payload
    (`imagecodec.average_hash`): decode -> integer luma -> grid block
    means -> threshold bits, emitted as a fixed-width hex string column
    ``phash``. Visually identical images collide even when their encoded
    bytes differ, so an exact groupBy/join on ``phash`` IS the image
    near-dup operator — one narrow hash shuffle at any corpus scale, no
    pairwise comparisons. Hamming-tolerant matching can reuse the SimHash
    pigeonhole buckets (`operators/dedup.py`) on the same bits."""
    from .imagecodec import average_hash, decode_image
    return transform_payloads(
        df, id_col,
        lambda raw: {"phash": average_hash(decode_image(raw), grid)},
        PHASH_FIELDS, payload_col=payload_col, keep_cols=keep_cols)


def video_phash_signature(df: DataFrame, id_col: str,
                          num_frames: int = 8,
                          payload_col: str = "payload",
                          grid: int = 8) -> DataFrame:
    """Per-video ORDERED frame-pHash sequence (r15) — the video
    near-dup signature, composing :func:`sample_frames` (evenly-spaced
    Motion-JPEG frames) with :func:`perceptual_hash_images` per frame:
    ``(id_col, phash_seq: array<string>)``. Re-encoded copies of the
    same footage collapse to the same sequence (pHash absorbs the
    pixel-level re-encode differences), so EXACT groupBy/join on
    ``phash_seq`` is the video near-dup operator; for
    trimmed/reordered variants compare hash SETS instead —
    ``size(array_intersect(a, b)) / size(array_union(a, b))`` is a
    pure-Column Jaccard. One Arrow frame explosion + one per-id
    aggregation (the only exchange; rows are id + a few hex strings,
    never pixels)."""
    frames = sample_frames(df, id_col, num_frames,
                           payload_col=payload_col)
    hashed = perceptual_hash_images(frames, id_col,
                                    payload_col="frame", grid=grid,
                                    keep_cols=["frame_idx"])
    return (hashed.groupBy(id_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("frame_idx", "phash"))),
                lambda s: s["phash"]).alias("phash_seq")))


def sample_frames(df: DataFrame, id_col: str, num_frames: int,
                  payload_col: str = "payload",
                  decoder: Callable[[bytes, int], list] | None = None,
                  keep_cols: list[str] | None = None) -> DataFrame:
    """Frame sampling for video-like payloads: emits one row per sampled
    frame ``(id, frame_idx, frame: binary)``. AVI payloads are REAL as
    of round 8: the RIFF container is parsed and ``num_frames`` evenly
    spaced video-stream frames are emitted (each an independent JPEG for
    Motion-JPEG files, decodable downstream by ``decode_image`` —
    `operators/avicodec.py`); raw Annex B H.264 streams decode their
    I_PCM keyframes to PPM frames (r17, `operators/h264codec.py` —
    coded macroblocks refuse loudly). An injected ``decoder``
    overrides; any other payload falls back to ``num_frames``
    evenly-spaced byte slices (deterministic fake; the row-explosion
    plumbing is real).
    ``keep_cols`` ride through the explosion (round 11) so downstream
    feature rollups need no join back to the source table — at corpus
    scale that join is a full shuffle of the frame rows."""
    keep = keep_cols or []
    src = df.select(F.col(id_col).alias("_id"),
                    F.col(payload_col).alias("_p"), *keep)
    out_schema = StructType(
        [StructField("_id", src.schema["_id"].dataType)]
        + [src.schema[c] for c in keep]
        + [StructField("frame_idx", LongType()),
           StructField("frame", BinaryType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avicodec import is_avi, mjpeg_frame_sampler
        from .h264codec import h264_frame_sampler, is_h264
        from .mkvcodec import is_mkv, mkv_frame_sampler
        from .mp4codec import is_mp4, mp4_frame_sampler
        for pdf in batches:
            # per-batch frame-sample memo on payload bytes (r18) — the
            # transform_payloads rationale: pure function of the bytes,
            # duplicated payloads sample once per batch
            cache: dict = {}
            rows = []
            for j, raw in enumerate(pdf["_p"]):
                if raw is None:
                    continue
                raw = bytes(raw)
                hit = cache.get(raw)
                if hit is not None:
                    base = ([pdf["_id"].iloc[j]]
                            + [pdf[c].iloc[j] for c in keep])
                    for i, f in enumerate(hit):
                        rows.append(base + [i, f])
                    continue
                if decoder is not None:
                    fs = decoder(raw, num_frames)
                elif is_avi(raw):
                    fs = mjpeg_frame_sampler(raw, num_frames)
                elif is_h264(raw):
                    # r17: raw Annex B H.264 — I_PCM keyframes decode
                    # to PPM frames (h264codec). Coded (CAVLC/CABAC)
                    # or corrupt streams refuse PER PAYLOAD: zero
                    # frames for this video (filterable — its id is
                    # absent downstream), never a task abort (the
                    # 100 TB job-survival contract).
                    try:
                        fs = h264_frame_sampler(raw, num_frames)
                    except (NotImplementedError, ValueError,
                            IndexError):
                        cache[raw] = []
                        continue
                elif is_mp4(raw):
                    # r18: MP4/ISO-BMFF — demux the video track to
                    # Annex B and decode through h264codec (I_PCM) or
                    # the system libde265 (HEVC). Same per-payload
                    # refusal contract as the raw H.264 branch.
                    try:
                        fs = mp4_frame_sampler(raw, num_frames)
                    except (NotImplementedError, ValueError,
                            IndexError, struct.error):
                        cache[raw] = []
                        continue
                elif is_mkv(raw):
                    # r18: Matroska/WebM — VP8 keyframes decode
                    # through the system libwebp (each frame
                    # rewrapped as a one-chunk WebP), H.264/HEVC
                    # tracks re-expressed as Annex B and routed like
                    # the MP4 branch. Same per-payload refusal.
                    try:
                        fs = mkv_frame_sampler(raw, num_frames)
                    except (NotImplementedError, ValueError,
                            IndexError, struct.error):
                        cache[raw] = []
                        continue
                else:
                    step = max(len(raw) // num_frames, 1)
                    fs = [raw[i * step:(i + 1) * step]
                          for i in range(num_frames)]
                cache[raw] = fs
                base = [pdf["_id"].iloc[j]] + [pdf[c].iloc[j] for c in keep]
                for i, f in enumerate(fs):
                    rows.append(base + [i, f])
            if rows:
                yield pd.DataFrame(
                    rows, columns=["_id", *keep, "frame_idx", "frame"])

    return src.mapInPandas(run, out_schema).withColumnRenamed("_id", id_col)


def extract_features(df: DataFrame, id_col: str,
                     payload_col: str = "payload",
                     codec: Callable[[bytes], object] | None = None,
                     featurizer: Callable[[object], dict] | None = None
                     ) -> DataFrame:
    """Per-payload features via one streaming pass per partition
    (mapInPandas). Default featurizer is the deterministic byte-level one
    (decode stub); pass ``codec`` + ``featurizer`` for real modalities."""
    src = df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_p"))
    out_schema = StructType([StructField("_id", src.schema["_id"].dataType)]
                            + FEATURE_SCHEMA_FIELDS)

    def byte_features(raw: bytes) -> dict:
        arr = np.frombuffer(raw, dtype=np.uint8)
        counts = np.bincount(arr, minlength=256).astype(np.float64)
        probs = counts[counts > 0] / arr.size
        return {
            "num_bytes": int(arr.size),
            "checksum": int(zlib.crc32(raw)),
            "byte_mean": float(arr.mean()),
            "byte_entropy": float(-(probs * np.log2(probs)).sum()),
        }

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for _id, raw in zip(pdf["_id"], pdf["_p"]):
                if raw is None:
                    continue
                raw = bytes(raw)
                if codec is not None and featurizer is not None:
                    feats = featurizer(decode_payload(raw, "custom", codec))
                else:
                    feats = byte_features(raw)
                rows.append({"_id": _id, **feats})
            if rows:
                yield pd.DataFrame(rows)

    return src.mapInPandas(build, out_schema).withColumnRenamed("_id", id_col)


PDF_TEXT_FIELDS = [
    StructField("text", StringType()),
    StructField("pages", LongType()),
    StructField("streams", LongType()),
    StructField("has_type0", BooleanType()),
    StructField("type0_coverage", DoubleType()),
]


def extract_pdf_text(df: DataFrame, id_col: str,
                     payload_col: str = "payload",
                     keep_cols: list[str] | None = None,
                     password: bytes = b"") -> DataFrame:
    """PDF text extraction (r15, ``operators/pdfcodec.py`` — the
    document sibling of ``html_to_text``): visible text from every
    content stream's text-showing operators plus the structural
    metadata pipelines route on, ONE parse per document
    (``pdf_extract``) in one streaming Arrow pass per partition.
    Encrypted/undecodable payloads become an all-null row (LOUD:
    filterable on ``text IS NULL`` — a single bad capture must not
    abort a 100 TB extraction job); composite-font documents are
    flagged via ``has_type0``, and ``type0_coverage`` (r17) reports
    the measured fraction of composite-font codes that actually
    mapped to text — quarantine glyph-id-only documents on
    ``has_type0 AND coalesce(type0_coverage, 0) < 1`` instead of
    trusting partial text silently."""
    from .pdfcodec import pdf_extract

    def one(raw: bytes) -> dict:
        # broad catch: any per-payload failure nulls the row (the
        # 100 TB job-survival contract), never aborts the task
        try:
            info = pdf_extract(raw, password)
        except Exception:
            return {"text": None, "pages": None, "streams": None,
                    "has_type0": None, "type0_coverage": None}
        return {"text": info["text"], "pages": info["pages"],
                "streams": info["streams"],
                "has_type0": info["has_type0"],
                "type0_coverage": info["type0_coverage"]}

    return transform_payloads(df, id_col, one, PDF_TEXT_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


DOCX_TEXT_FIELDS = [
    StructField("text", StringType()),
    StructField("paragraphs", LongType()),
    StructField("tables", LongType()),
]


def extract_docx_text(df: DataFrame, id_col: str,
                      payload_col: str = "payload",
                      keep_cols: list[str] | None = None) -> DataFrame:
    """DOCX text extraction (r15, ``operators/docxcodec.py``):
    paragraph text from ``word/document.xml`` plus the structural
    counts, ONE unzip per document (``docx_extract``) in one
    streaming Arrow pass per partition. Legacy ``.doc``, non-DOCX
    ZIPs, and bomb-guard hits become an all-null row (LOUD:
    filterable on ``text IS NULL``) instead of aborting the job —
    route payloads with ``detect_mime`` upstream to keep the null
    fraction visible."""
    from .docxcodec import docx_extract

    def one(raw: bytes) -> dict:
        try:
            info = docx_extract(raw)
        except Exception:
            return {"text": None, "paragraphs": None, "tables": None}
        return {"text": info["text"],
                "paragraphs": info["paragraphs"],
                "tables": info["tables"]}

    return transform_payloads(df, id_col, one, DOCX_TEXT_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


OFFICE_TEXT_FIELDS = [
    StructField("text", StringType()),
    StructField("units", LongType()),
]


def extract_xlsx_text(df: DataFrame, id_col: str,
                      payload_col: str = "payload",
                      keep_cols: list[str] | None = None) -> DataFrame:
    """XLSX flat-text extraction (r15, ``operators/ooxmlcodec.py``):
    cell values tab/newline-joined plus the cell count (``units``),
    one unzip per document in one Arrow pass. Legacy ``.xls`` /
    non-XLSX ZIPs / bomb-guard hits become an all-null row (loud,
    filterable)."""
    from .ooxmlcodec import xlsx_extract

    def one(raw: bytes) -> dict:
        # broad catch is the contract here: ANY per-payload parse
        # failure (corrupt deflate raises zlib.error, truncated
        # members BadZipFile — neither a ValueError) must null the
        # row, not abort the job
        try:
            info = xlsx_extract(raw)
            return {"text": info["text"], "units": info["units"]}
        except Exception:
            return {"text": None, "units": None}

    return transform_payloads(df, id_col, one, OFFICE_TEXT_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


def extract_pptx_text(df: DataFrame, id_col: str,
                      payload_col: str = "payload",
                      keep_cols: list[str] | None = None) -> DataFrame:
    """PPTX slide-text extraction (r15): slide text (slides separated
    by blank lines) plus the slide count (``units``); same loud-null
    contract as the other document extractors."""
    from .ooxmlcodec import pptx_extract

    def one(raw: bytes) -> dict:
        try:
            info = pptx_extract(raw)
            return {"text": info["text"], "units": info["units"]}
        except Exception:
            return {"text": None, "units": None}

    return transform_payloads(df, id_col, one, OFFICE_TEXT_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


def extract_odt_text(df: DataFrame, id_col: str,
                     payload_col: str = "payload",
                     keep_cols: list[str] | None = None) -> DataFrame:
    """OpenDocument Text extraction (r16, ``operators/odfcodec.py``):
    paragraph text from ``content.xml`` plus the paragraph count
    (``units``) — the consumer for the ``application/vnd.oasis.
    opendocument.text`` routing ``detect_ooxml`` already emits; same
    loud-null contract as the other document extractors."""
    from .odfcodec import odt_extract

    def one(raw: bytes) -> dict:
        try:
            info = odt_extract(raw)
            return {"text": info["text"], "units": info["paragraphs"]}
        except Exception:
            return {"text": None, "units": None}

    return transform_payloads(df, id_col, one, OFFICE_TEXT_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


def extract_ods_text(df: DataFrame, id_col: str,
                     payload_col: str = "payload",
                     keep_cols: list[str] | None = None) -> DataFrame:
    """OpenDocument SPREADSHEET extraction (r16,
    ``operators/odfcodec.py::ods_extract``): cell display text
    (tab/newline flat view, tables separated by blank lines) plus the
    cell count (``units``) — the consumer for ``application/vnd.
    oasis.opendocument.spreadsheet`` routing; same loud-null contract
    as the other document extractors."""
    from .odfcodec import ods_extract

    def one(raw: bytes) -> dict:
        try:
            info = ods_extract(raw)
            return {"text": info["text"], "units": info["units"]}
        except Exception:
            return {"text": None, "units": None}

    return transform_payloads(df, id_col, one, OFFICE_TEXT_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


SUBTITLE_TEXT_FIELDS = [
    StructField("text", StringType()),
    StructField("cues", LongType()),
    StructField("sub_codec", StringType()),
    StructField("lang", StringType()),
]


def extract_subtitle_text(df: DataFrame, id_col: str,
                          payload_col: str = "payload",
                          keep_cols: list[str] | None = None
                          ) -> DataFrame:
    """Subtitle text out of subtitle payloads in EVERY crawl shape
    (r18, ``operators/subtitlecodec.py::subtitle_text``): Matroska/
    WebM subtitle tracks (S_TEXT/UTF8 verbatim, S_TEXT/ASS with
    override tags stripped), MP4 tx3g timed-text tracks (3GPP TS
    26.245 — u16-length-prefixed samples, modifier boxes skipped,
    mdhd language decoded) AND the bare sidecar files — SRT, WebVTT
    (NOTE/STYLE blocks skipped, cue tags and character escapes
    decoded), ASS/SSA (``Format:``-declared field order) — one sniff
    dispatch per payload. Returns the text, cue count, the format
    (the MKV track's CodecID or ``srt``/``vtt``/``ass``) and the
    declared language (``und`` for bare files, which carry none).
    Payloads with no extractable subtitle text (bitmap subs,
    unrecognized bytes) become an all-null row — same loud-null
    contract as the document extractors."""
    from .subtitlecodec import subtitle_text

    def one(raw: bytes) -> dict:
        try:
            info = subtitle_text(raw)
            return {"text": info["text"], "cues": info["cues"],
                    "sub_codec": info["format"],
                    "lang": info["lang"]}
        except Exception:
            return {"text": None, "cues": None, "sub_codec": None,
                    "lang": None}

    return transform_payloads(df, id_col, one, SUBTITLE_TEXT_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


COVER_ART_FIELDS = [
    StructField("cover_mime", StringType()),
    StructField("cover", BinaryType()),
]


def extract_cover_art(df: DataFrame, id_col: str,
                      payload_col: str = "payload",
                      keep_cols: list[str] | None = None
                      ) -> DataFrame:
    """Embedded cover art out of any audio/AV container (r18,
    ``operators/mediameta.py::cover_art``): ID3v2 APIC, FLAC PICTURE
    blocks, the Ogg METADATA_BLOCK_PICTURE base64 comment, MP4
    ``covr`` atoms, Matroska image attachments — the extracted image
    feeds ``decode_image`` for album-art dedup (byte-different
    re-encodes of the same art collapse on decoded pixels).
    Payloads without a picture become an all-null row (loud-null
    contract)."""
    from .mediameta import cover_art

    def one(raw: bytes) -> dict:
        try:
            c = cover_art(raw)
            return {"cover_mime": c["mime"], "cover": c["image"]}
        except Exception:
            return {"cover_mime": None, "cover": None}

    return transform_payloads(df, id_col, one, COVER_ART_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)


MEDIA_META_FIELDS = [
    StructField("kind", StringType()),
    StructField("title", StringType()),
    StructField("artist", StringType()),
    StructField("album", StringType()),
    StructField("date", StringType()),
    StructField("software", StringType()),
    StructField("genre", StringType()),
    StructField("comment", StringType()),
    StructField("copyright", StringType()),
    StructField("make", StringType()),
    StructField("model", StringType()),
    StructField("orientation", LongType()),
    StructField("has_gps", BooleanType()),
    StructField("n_fields", LongType()),
]


def extract_media_metadata(df: DataFrame, id_col: str,
                           payload_col: str = "payload",
                           keep_cols: list[str] | None = None
                           ) -> DataFrame:
    """Embedded media metadata as one uniform nullable record (r18,
    ``operators/mediameta.py::media_metadata``): EXIF IFDs out of
    JPEG/TIFF (Make/Model/Software/Artist/dates/Orientation and the
    ``has_gps`` lat+lon-present flag — the PII routing signal for
    image redaction), JPEG COM comments, ID3v2.2/2.3/2.4 text frames
    (+ the ID3v1 trailer) from MPEG audio, Vorbis comments from all
    three carriers (FLAC blocks, OpusTags, ``\\x03vorbis``), PNG
    tEXt/zTXt/iTXt chunks, RIFF LIST/INFO, XMP packets in JPEG APP1
    (filling keys EXIF left empty — the usual precedence), and the
    PDF ``/Info`` document-information dictionary (last-wins across
    incremental updates; encrypted documents report the blank record
    rather than ciphertext). One bounded pass per
    payload in the Arrow batch; unrecognized payloads become an
    all-null row (loud-null contract) so curation filters run as
    plain Column predicates downstream."""
    from .mediameta import media_metadata

    def one(raw: bytes) -> dict:
        try:
            return dict(media_metadata(raw))
        except Exception:
            return {f.name: None for f in MEDIA_META_FIELDS}

    return transform_payloads(df, id_col, one, MEDIA_META_FIELDS,
                              payload_col=payload_col,
                              keep_cols=keep_cols)
