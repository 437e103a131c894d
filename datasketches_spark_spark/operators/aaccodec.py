"""AAC ADTS framing (ISO/IEC 14496-3 §1.A.3) — metadata without
decode, the #2 crawl audio codec after MP3.

Sample decode of AAC needs the full MDCT filterbank + Huffman
codebooks + TNS/PNS tools — large normative tables with NO reference
implementation in this container to validate against, so decode
refuses honestly (the ``mp3codec`` convention; see that module's
header for why an unvalidatable decoder is worse than a refusal).
What a pipeline needs from crawled ``.aac`` files is METADATA and
IDENTITY, and the ADTS frame header is public and tiny (the third
instance of the frame-walk pattern after ``mp3codec.mp3_audio_hash``
and ``oggcodec.ogg_audio_hash``):

* ``adts_info`` walks every frame header exactly (syncword, profile,
  sampling-frequency index, channel configuration, frame length,
  optional CRC) — never a byte-scan heuristic, so corrupt chains are
  detected, not guessed at; ID3v2 leaders and ID3v1 trailers are
  skipped like MP3's.
* ``aac_audio_hash`` is the tag-invariant content identity: md5 over
  the raw_data_block PAYLOAD bytes only — the 7/9-byte ADTS headers,
  CRC words, and any ID3 dressing are excluded. Because an MP4
  ``mp4a`` track stores exactly those payload bytes as its samples
  (ADTS headers are added only when muxing to ADTS), the SAME encode
  packaged as ``.aac`` and as ``.m4a`` collapses to ONE hash —
  cross-container identity with :func:`mp4codec.mp4_audio_hash`, the
  WAV↔FLAC precedent (``audiocodec.audio_content_hash``) applied to
  the compressed-audio world.

Scale shape: one sequential pass over the payload inside the Arrow
worker; only the 32-char hex key ever shuffles.

Reference parity note: /root/reference has no media handling at all
(its ``src/main`` is 7 Scala files of sketch registration); this
module is part of the engine's training-data-pipeline extension
surface (SURVEY.md §2, multimodal columns).
"""

from __future__ import annotations

import hashlib

__all__ = ["is_adts", "adts_info", "aac_audio_hash",
           "build_adts_stream"]

# sampling_frequency_index -> Hz (index 13/14 reserved, 15 escape)
_FREQ = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
         16000, 12000, 11025, 8000, 7350]
_PROFILES = ["Main", "LC", "SSR", "LTP"]


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + size + footer


def _parse_header(data: bytes, pos: int):
    """Parse a 7/9-byte ADTS frame header; None when not a frame."""
    if pos + 7 > len(data):
        return None
    b = data[pos:pos + 7]
    # syncword 0xFFF + layer == 00 (the layer bits distinguish ADTS
    # from an MPEG audio frame, whose layer is never 00)
    if b[0] != 0xFF or (b[1] & 0xF6) != 0xF0:
        return None
    mpeg2 = (b[1] >> 3) & 1
    crc_absent = b[1] & 1
    profile = (b[2] >> 6) & 0x3
    freq_idx = (b[2] >> 2) & 0xF
    if freq_idx >= 13:
        return None                    # reserved/escape
    channels = ((b[2] & 1) << 2) | ((b[3] >> 6) & 0x3)
    frame_len = ((b[3] & 0x3) << 11) | (b[4] << 3) | ((b[5] >> 5) & 0x7)
    n_blocks = (b[6] & 0x3) + 1
    hdr_len = 7 if crc_absent else 9
    if frame_len < hdr_len:
        return None
    return {"mpeg2": bool(mpeg2), "profile": profile,
            "sample_rate": _FREQ[freq_idx], "freq_idx": freq_idx,
            "channels": channels, "frame_len": frame_len,
            "hdr_len": hdr_len, "n_blocks": n_blocks}


def is_adts(data: bytes) -> bool:
    """Cheap sniff: a valid ADTS frame header (after any ID3v2
    leader) whose declared length lands on EOF or another header —
    the two-frame check real demuxers use, because 0xFFF syncs occur
    in arbitrary binary."""
    from .mp3codec import _is_trailing_tag
    data = bytes(data)
    pos = _skip_id3v2(data)
    hdr = _parse_header(data, pos)
    if hdr is None:
        return False
    nxt = pos + hdr["frame_len"]
    if nxt >= len(data) or _is_trailing_tag(data, nxt) \
            or data[nxt:nxt + 3] == b"TAG":
        return True
    return _parse_header(data, nxt) is not None


def _walk(data: bytes):
    """Yield (pos, hdr) per frame; ValueError on mid-stream desync."""
    from .mp3codec import _is_trailing_tag
    data = bytes(data)
    pos = _skip_id3v2(data)
    end = len(data)
    if end >= 128 and data[end - 128:end - 125] == b"TAG":
        end -= 128
    first = _parse_header(data, pos)
    if first is None:
        raise ValueError("not an ADTS stream (no frame sync after tags)")
    p = pos
    while p + 7 <= end:
        hdr = _parse_header(data, p)
        if hdr is None:
            if _is_trailing_tag(data, p) or end - p < first["frame_len"]:
                break                  # trailing tag / tail padding
            raise ValueError(f"ADTS: lost frame sync at byte {p} of {end}")
        if hdr["sample_rate"] != first["sample_rate"] \
                or hdr["channels"] != first["channels"]:
            raise ValueError("ADTS: mixed rate/channel frame chain")
        if p + hdr["frame_len"] > end:
            raise ValueError(f"ADTS: truncated final frame at byte {p}")
        yield p, hdr
        p += hdr["frame_len"]


def adts_info(data: bytes) -> dict:
    """Walk the ADTS frame chain: ``{profile, sample_rate, channels,
    n_frames, duration_s, bitrate_kbps, crc}``. 1024 samples per
    raw_data_block (the AAC frame length); duration and the
    byte-weighted mean bitrate come from the true frame walk. Raises
    ``ValueError`` for non-ADTS bytes or a corrupt chain."""
    n_frames = 0
    n_blocks = 0
    tot_bytes = 0
    first = None
    crc = False
    for _, hdr in _walk(data):
        if first is None:
            first = hdr
            crc = hdr["hdr_len"] == 9
        n_frames += 1
        n_blocks += hdr["n_blocks"]
        tot_bytes += hdr["frame_len"]
    assert first is not None
    duration = n_blocks * 1024 / first["sample_rate"]
    return {"profile": _PROFILES[first["profile"]],
            "mpeg_version": 2 if first["mpeg2"] else 4,
            "sample_rate": first["sample_rate"],
            "channels": first["channels"],
            "n_frames": n_frames,
            "duration_s": round(duration, 3),
            "bitrate_kbps": round(tot_bytes * 8 / 1000 / duration, 1),
            "crc": crc}


def aac_audio_hash(data: bytes) -> str:
    """Tag-invariant content identity for an ADTS AAC stream: md5
    over the raw_data_block PAYLOADS only (ADTS headers, CRC words,
    ID3v2/ID3v1/APEv2 dressing excluded). Equals
    :func:`mp4codec.mp4_audio_hash` of the same encode muxed into an
    MP4 ``mp4a`` track — the payload bytes ARE the MP4 samples.
    Exact-stream identity modulo packaging, not perceptual: a
    re-encode changes the hash."""
    data = bytes(data)
    h = hashlib.md5()
    for p, hdr in _walk(data):
        h.update(data[p + hdr["hdr_len"]:p + hdr["frame_len"]])
    return h.hexdigest()


def aac_frame_payloads(data: bytes) -> list[bytes]:
    """The raw_data_block payload of every ADTS frame — what an MP4
    muxer stores as ``mp4a`` samples (fixture plumbing for the
    cross-container tests; also the sample source for
    ``build_mp4``)."""
    data = bytes(data)
    return [data[p + hdr["hdr_len"]:p + hdr["frame_len"]]
            for p, hdr in _walk(data)]


def build_adts_stream(payload_seed: bytes, n_frames: int,
                      freq_idx: int = 3, channels: int = 2,
                      crc: bool = False,
                      payloads: list[bytes] | None = None) -> bytes:
    """TEST/FIXTURE writer: a structurally valid ADTS frame chain
    whose frame PAYLOADS are deterministic filler derived from
    ``payload_seed`` (the ``mp3codec.build_frame_stream`` convention
    — NOT decodable audio; building genuinely decodable AAC would
    need the normative Huffman codebooks whose absence keeps sample
    decode refused). Pass explicit ``payloads`` to mux the SAME
    content the MP4 fixture writer carries (the cross-container
    collapse). ``crc`` emits the 9-byte protected-header form."""
    if not 0 <= freq_idx <= 12:
        raise ValueError("freq_idx 0..12")
    if not 1 <= channels <= 7:
        raise ValueError("channels 1..7")
    if payloads is None:
        payloads = []
        for i in range(n_frames):
            fill = hashlib.md5(payload_seed
                               + i.to_bytes(4, "big")).digest()
            body = (fill * 16)[: 200 + (i % 3) * 16]
            # keep filler from faking a sync byte pair
            payloads.append(bytes(b if b != 0xFF else 0xFE
                                  for b in body))
    out = bytearray()
    hdr_len = 9 if crc else 7
    for body in payloads:
        flen = hdr_len + len(body)
        if flen >= 1 << 13:
            raise ValueError("frame too long for the 13-bit field")
        b = bytearray(hdr_len)
        b[0] = 0xFF
        b[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
        b[2] = (1 << 6) | (freq_idx << 2) | ((channels >> 2) & 1)
        b[3] = ((channels & 0x3) << 6) | ((flen >> 11) & 0x3)
        b[4] = (flen >> 3) & 0xFF
        b[5] = ((flen & 0x7) << 5) | 0x1F     # fullness high bits
        b[6] = 0xFC                           # fullness low + 1 block
        if crc:
            b[7] = b[8] = 0                   # deterministic CRC field
        out += bytes(b) + body
    return bytes(out)
