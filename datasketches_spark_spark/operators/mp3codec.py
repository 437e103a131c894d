"""MPEG audio (MP3) frame parsing — metadata without decode.

Full MPEG-1 Layer III sample decode needs 34 normative Huffman tables +
IMDCT + the polyphase synthesis filterbank; the engine refuses that
honestly (``audiocodec.decode_audio``). The refusal is a VERIFIABILITY
decision, not just scope: the Huffman tables and the 512-tap synthesis
window are large normative constants with NO reference implementation
in this container to validate against (contrast ``compat/cpc.py``,
validated live against the bundled datasketches-java, or the G.711
codecs validated against stdlib ``audioop``) — a decoder whose tables
cannot be checked would roundtrip against itself and still silently
mis-decode real-world files, which is worse than refusing. What a data pipeline usually
needs from crawled MP3s, though, is METADATA — duration, bitrate,
sample rate, channel layout, frame integrity — and the MPEG frame
header layout (ISO/IEC 11172-3 §2.4.1.3) is public and tiny. This
module walks the frame stream exactly:

* skips a leading ID3v2 tag (syncsafe size) and a trailing ID3v1 tag;
* parses every frame header (version 1/2/2.5, layers I/II/III; bitrate
  and sample-rate tables; padding) and steps frame-by-frame — never a
  byte-scan heuristic, so corrupt streams are detected, not guessed at;
* reads a Xing/Info or VBRI header in the first frame when present
  (frame/byte counts for VBR duration);
* reports duration from the true frame count x samples-per-frame.

``is_mp3`` is a cheap sniff for dispatchers; ``mp3_info`` is the full
walk.
"""

from __future__ import annotations

__all__ = ["is_mp3", "mp3_info"]

# bitrate tables [kbps], index 1..14 (0 = free, 15 = bad)
_BITRATE = {
    # (version_group, layer): table — version_group: 1 = MPEG1, 2 = MPEG2/2.5
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {3: [44100, 48000, 32000],   # MPEG1
          2: [22050, 24000, 16000],   # MPEG2
          0: [11025, 12000, 8000]}    # MPEG2.5
_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}
_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def is_mp3(data: bytes) -> bool:
    """Cheap sniff: ID3v2 tag, or a valid MPEG frame sync at offset 0."""
    if data[:3] == b"ID3":
        return True
    return len(data) >= 4 and _parse_header(data, 0) is not None


def _parse_header(data: bytes, pos: int):
    """Parse a 4-byte MPEG frame header; None when not a valid frame."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer_code = (b1 >> 1) & 0x3       # 3=I, 2=II, 1=III
    if version == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code             # 1, 2, 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None                    # free-format/bad not supported
    vgroup = 1 if version == 3 else 2
    bitrate = _BITRATE[(vgroup, layer)][br_idx - 1] * 1000
    rate = _RATES[version][sr_idx]
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 0x3
    if layer == 1:
        frame_len = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        if layer == 3 and vgroup == 2:
            samples = 576
            frame_len = 72 * bitrate // rate + padding
        else:
            samples = 1152
            frame_len = 144 * bitrate // rate + padding
    return {"version": version, "layer": layer, "bitrate": bitrate,
            "sample_rate": rate, "mode": mode, "frame_len": frame_len,
            "samples": samples}


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + size + footer


# Trailing-metadata markers that legitimately terminate the frame
# chain (r18, ADVICE fix): APEv1/v2 tags start with "APETAGEX"
# (header or footer — either can be the first bytes after the last
# frame), Lyrics3v1/v2 blocks with "LYRICSBEGIN", extended ID3v1
# with "TAG+", and some writers append a whole ID3v2 tag ("ID3") or
# its footer ("3DI") at EOF. Any of these at the walk position ends
# the stream cleanly; anything else mid-stream is still corruption.
_TRAIL_TAGS = (b"APETAGEX", b"LYRICSBEGIN", b"TAG+", b"ID3", b"3DI")


def _is_trailing_tag(data: bytes, p: int) -> bool:
    head = data[p:p + 11]
    return any(head.startswith(m) for m in _TRAIL_TAGS)


def _xing_frames(data: bytes, pos: int, hdr) -> int | None:
    """Frame count from a Xing/Info (or VBRI) header in the first frame."""
    if hdr["layer"] == 3:
        mono = hdr["mode"] == 3
        off = (21 if mono else 36) if hdr["version"] == 3 \
            else (13 if mono else 21)
        tag = data[pos + off:pos + off + 4]
        if tag in (b"Xing", b"Info"):
            flags = int.from_bytes(data[pos + off + 4:pos + off + 8], "big")
            if flags & 1:
                return int.from_bytes(
                    data[pos + off + 8:pos + off + 12], "big")
    tag = data[pos + 36:pos + 40]
    if tag == b"VBRI":  # header(4) + version(2) + delay(2) + quality(2)
        # + bytes(4) -> frame count at tag offset 14
        return int.from_bytes(data[pos + 50:pos + 54], "big")
    return None


def mp3_info(data: bytes) -> dict:
    """Walk the MPEG frame stream: ``{version, layer, sample_rate,
    channels, mode, n_frames, duration_s, bitrate_kbps, vbr}``.
    ``bitrate_kbps`` is the byte-weighted average over all frames (==
    the nominal rate for CBR). Raises ``ValueError`` for non-MPEG bytes
    or a corrupt frame chain."""
    data = bytes(data)
    pos = _skip_id3v2(data)
    end = len(data)
    # guard: for < 128-byte inputs the slice would wrap into the frame
    # body and a chance 'TAG' would drive `end` negative
    if end >= 128 and data[end - 128:end - 125] == b"TAG":
        end -= 128
    first = _parse_header(data, pos)
    if first is None:
        raise ValueError(
            "not an MPEG audio stream (no frame sync after tags)")
    xing = _xing_frames(data, pos, first)
    n_frames = 0
    tot_bytes = 0
    bitrates = set()
    p = pos
    while p + 4 <= end:
        hdr = _parse_header(data, p)
        if hdr is None:
            # allow trailing metadata (APEv2/Lyrics3/ID3 variants) and
            # short tag-writer padding at the very end; mid-stream
            # desync is corruption
            if _is_trailing_tag(data, p) or end - p < first["frame_len"]:
                break
            raise ValueError(
                f"MP3: lost frame sync at byte {p} of {end}")
        if (hdr["version"] != first["version"]
                or hdr["layer"] != first["layer"]
                or hdr["sample_rate"] != first["sample_rate"]):
            raise ValueError("MP3: mixed version/layer/rate frame chain")
        n_frames += 1
        tot_bytes += hdr["frame_len"]
        bitrates.add(hdr["bitrate"])
        p += hdr["frame_len"]
    if n_frames == 0:
        raise ValueError("MP3: no complete frames")
    frames = xing or n_frames
    duration = frames * first["samples"] / first["sample_rate"]
    avg_kbps = (tot_bytes * 8 / 1000) / (n_frames * first["samples"]
                                         / first["sample_rate"])
    return {
        "version": _VERSION_NAME[first["version"]],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": 1 if first["mode"] == 3 else 2,
        "mode": _MODES[first["mode"]],
        "n_frames": frames,
        "duration_s": round(duration, 3),
        "bitrate_kbps": round(avg_kbps, 1),
        "vbr": len(bitrates) > 1 or xing is not None,
    }


def mp3_audio_hash(data: bytes) -> str:
    """Tag-invariant CONTENT identity for an MPEG audio stream (r17):
    md5 over the audio FRAME bytes only — ID3v2 leader, ID3v1 trailer,
    trailing tag-writer padding, and a leading Xing/Info/VBRI metadata
    frame (it carries no audio) are all excluded. Re-TAGGED copies of
    one MP3 — the dominant crawl duplication mode for audio (same rip,
    different metadata) — collapse to one hash with NO sample decode,
    so MP3 dedup works even where no system decoder exists. This is
    exact-stream identity modulo metadata, not perceptual identity: a
    re-ENCODE changes the hash (route decodable formats through
    ``audio_fingerprint`` for that)."""
    import hashlib
    data = bytes(data)
    pos = _skip_id3v2(data)
    end = len(data)
    if end >= 128 and data[end - 128:end - 125] == b"TAG":
        end -= 128
    first = _parse_header(data, pos)
    if first is None:
        raise ValueError(
            "not an MPEG audio stream (no frame sync after tags)")
    if _xing_frames(data, pos, first) is not None:
        pos += first["frame_len"]          # metadata frame: no audio
    h = hashlib.md5()
    p = pos
    while p + 4 <= end:
        hdr = _parse_header(data, p)
        if hdr is None:
            if _is_trailing_tag(data, p) or end - p < first["frame_len"]:
                break                      # trailing tag / tail padding
            raise ValueError(f"MP3: lost frame sync at byte {p}")
        h.update(data[p:min(p + hdr["frame_len"], end)])
        p += hdr["frame_len"]
    return h.hexdigest()


def build_frame_stream(payload_seed: bytes, n_frames: int,
                       bitrate_idx: int = 9, sr_idx: int = 0,
                       xing: bool = False) -> bytes:
    """TEST/FIXTURE writer: a structurally valid MPEG-1 Layer III
    frame chain whose frame PAYLOADS are deterministic filler derived
    from ``payload_seed`` — exercising every structural consumer
    (``mp3_info``, ``mp3_audio_hash``, tag walks) for real. The
    payloads are NOT encoded audio (sample decode of these frames is
    meaningless and the engine's decoder refusal stands); building
    genuinely decodable Layer III frames would need the same normative
    Huffman tables whose absence keeps sample decode refused. With
    ``xing`` a leading Info frame (frame-count field set) is emitted —
    the metadata frame ``mp3_audio_hash`` must skip."""
    import hashlib
    if not 1 <= bitrate_idx <= 14 or not 0 <= sr_idx <= 2:
        raise ValueError("bad bitrate/sample-rate index")
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), 0x00])
    parsed = _parse_header(hdr, 0)
    assert parsed is not None
    flen = parsed["frame_len"]
    out = bytearray()
    if xing:
        body = bytearray(flen - 4)
        body[32:36] = b"Info"              # stereo MPEG-1 offset 36-4
        body[36:40] = (1).to_bytes(4, "big")   # flags: FRAMES field
        body[40:44] = n_frames.to_bytes(4, "big")
        out += hdr + bytes(body)
    for i in range(n_frames):
        fill = hashlib.md5(payload_seed + i.to_bytes(4, "big")).digest()
        body = (fill * ((flen - 4) // 16 + 1))[:flen - 4]
        # keep filler from faking a frame-sync byte pair
        body = bytes(b if b != 0xFF else 0xFE for b in body)
        out += hdr + body
    return bytes(out)
