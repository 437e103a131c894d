"""Ogg container parsing (RFC 3533, public) — structure, metadata,
and tag-invariant content identity. No sample decode.

Ogg is the container for Opus and Vorbis — with MP3 the bulk of crawl
audio. Decoding the CODECS inside needs normative tables this
container cannot validate (the ``mp3codec`` refusal rationale applies
verbatim), but everything a data pipeline needs short of samples is
pure container structure, and RFC 3533 specifies it completely:

* page framing: capture pattern, version, header-type flags, granule
  position, serial, sequence number, **CRC** (§6: the direct CRC-32
  with polynomial 0x04c11db7, zero initial value, no reflection —
  computed over the page with the CRC field zeroed), segment lacing;
* packet reassembly across pages (lacing values of 255 continue a
  packet; the ``continued`` header flag spans page boundaries);
* codec identification from the first packet's magic (OpusHead /
  \\x01vorbis / \\x7fFLAC / \\x80theora) and the public header layouts
  for channels / rates / pre-skip;
* duration from the final granule position (Opus: 48 kHz ticks minus
  pre-skip; Vorbis: sample count at the ident-header rate).

``ogg_audio_hash`` is the MP3-style tag-invariant content identity:
md5 over the AUDIO packet bytes only — the comment/tags header packet
(OpusTags / \\x03vorbis, the thing retaggers rewrite) never
contributes — so re-tagged copies of one encode collapse with no
decode. ``build_ogg_stream`` is the structural fixture writer (valid
pages, CRCs and lacing; deterministic filler payloads that are NOT
decodable audio — the ``mp3codec.build_frame_stream`` convention).

Validation note: no Ogg tool exists in this container, so the CRC
parameters are pinned by RFC 3533's text and exercised by write/read
symmetry + corruption tests; a wrong-parameter implementation would
be internally consistent but reject real files — flagged here
honestly, same caveat class as the other container codecs.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["is_ogg", "ogg_info", "ogg_audio_hash",
           "ogg_audio_packets", "build_ogg_stream"]

_MAX_INPUT = 256 << 20
_MAX_SEGS = 255

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tab = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 \
                    else (r << 1)
                r &= 0xFFFFFFFF
            tab.append(r)
        _CRC_TABLE = tab
    return _CRC_TABLE


def _ogg_crc(data: bytes) -> int:
    """RFC 3533 §6 page CRC: direct CRC-32, poly 0x04c11db7, init 0,
    no reflection, no final xor."""
    tab = _crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ tab[((r >> 24) & 0xFF) ^ b]
    return r


def is_ogg(data: bytes) -> bool:
    return bytes(data[:4]) == b"OggS"


def _pages(data: bytes):
    """Yield validated pages: dicts with header fields + the payload
    and lacing table. Raises ``ValueError`` on a broken capture
    pattern mid-stream or a CRC mismatch (corruption is detected, not
    guessed around)."""
    data = bytes(data)
    if len(data) > _MAX_INPUT:
        raise ValueError(f"Ogg payload {len(data)} B exceeds the "
                         f"{_MAX_INPUT} B bomb guard")
    pos, n = 0, len(data)
    while pos < n:
        if data[pos:pos + 4] != b"OggS":
            raise ValueError(f"Ogg: lost page sync at byte {pos}")
        if pos + 27 > n:
            raise ValueError("Ogg: truncated page header")
        (ver, htype, granule, serial, seq, crc,
         nsegs) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if ver != 0:
            raise ValueError(f"Ogg: unknown stream structure "
                             f"version {ver}")
        lace_at = pos + 27
        if lace_at + nsegs > n:
            raise ValueError("Ogg: truncated lacing table")
        lacing = data[lace_at:lace_at + nsegs]
        body_at = lace_at + nsegs
        body_len = sum(lacing)
        if body_at + body_len > n:
            raise ValueError("Ogg: truncated page body")
        page = data[pos:body_at + body_len]
        zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        if _ogg_crc(zeroed) != crc:
            raise ValueError(f"Ogg: page CRC mismatch at byte {pos}")
        yield {"htype": htype, "granule": granule, "serial": serial,
               "seq": seq, "lacing": lacing,
               "body": data[body_at:body_at + body_len]}
        pos = body_at + body_len


def _packets(pages, serial: int):
    """Reassemble the packet stream of one logical stream: lacing
    values < 255 terminate a packet; a page whose first lacing
    continues the previous page's unfinished packet carries the
    ``continued`` flag (0x01)."""
    buf = bytearray()
    for pg in pages:
        if pg["serial"] != serial:
            continue
        off = 0
        for lv in pg["lacing"]:
            buf += pg["body"][off:off + lv]
            off += lv
            if lv < 255:
                yield bytes(buf)
                buf.clear()
    if buf:
        yield bytes(buf)          # unterminated final packet (truncated)


def _codec_of(first_packet: bytes):
    if first_packet.startswith(b"OpusHead"):
        return "opus"
    if first_packet.startswith(b"\x01vorbis"):
        return "vorbis"
    if first_packet.startswith(b"\x7fFLAC"):
        return "flac"
    if first_packet.startswith(b"\x80theora"):
        return "theora"
    return "unknown"


# header packets that carry no audio, per codec: (count, tags_magic)
_HEADER_PACKETS = {"opus": 2, "vorbis": 3, "flac": 2}


def _header_packet_count(codec: str, first_packet: bytes) -> int:
    """Non-audio header packets to exclude from the content hash.
    Opus and Vorbis fix the count (2 and 3, per RFC 7845 §5 and the
    Vorbis I spec §4.2); the Ogg-FLAC mapping instead DECLARES it —
    bytes 7-8 of the ``\\x7fFLAC`` mapping header are the big-endian
    u16 count of header packets that FOLLOW the first one (r18,
    ADVICE fix: encoders commonly emit seektable/padding metadata
    packets beyond the mandatory comment packet; hardcoding 2 leaked
    those into the hash). A declared 0 means "unknown"; fall back to
    the mandatory minimum (ident + comment)."""
    if codec == "flac" and len(first_packet) >= 9:
        declared = int.from_bytes(first_packet[7:9], "big")
        if declared > 0:
            return 1 + declared
    return _HEADER_PACKETS.get(codec, 1)


def ogg_info(data: bytes) -> dict:
    """Walk every page (CRC-validated): ``{codec, channels,
    sample_rate, pre_skip, n_pages, n_packets, duration_s, serials,
    n_audio_packets, audio_bytes, mean_packet_bytes,
    max_packet_bytes, bitrate_kbps}`` for the FIRST logical stream
    (the audio stream in the common single-stream files); multiplexed
    streams are counted in ``serials``. The packet-level fields (r18
    — the ``mp3_info`` parity) describe the AUDIO packets only
    (header packets excluded via the same per-codec rule
    ``ogg_audio_hash`` uses, incl. the declared Ogg-FLAC count), so
    audio quality filtering can run on Ogg without any decode."""
    pages = list(_pages(data))
    if not pages:
        raise ValueError("Ogg: no pages")
    serials = []
    for pg in pages:
        if pg["serial"] not in serials:
            serials.append(pg["serial"])
    main = serials[0]
    pkts = list(_packets(pages, main))
    if not pkts:
        raise ValueError("Ogg: stream has no packets")
    codec = _codec_of(pkts[0])
    channels = rate = pre_skip = None
    if codec == "opus" and len(pkts[0]) >= 16:
        # OpusHead: magic(8) version(1) channels(1) pre_skip(2 LE)
        # input_rate(4 LE) ... output is ALWAYS 48 kHz
        channels = pkts[0][9]
        pre_skip = struct.unpack_from("<H", pkts[0], 10)[0]
        rate = 48000
    elif codec == "vorbis" and len(pkts[0]) >= 16:
        # \x01vorbis + version(4) channels(1) rate(4 LE)
        channels = pkts[0][11]
        rate = struct.unpack_from("<I", pkts[0], 12)[0]
    last_granule = max((pg["granule"] for pg in pages
                        if pg["serial"] == main
                        and pg["granule"] >= 0), default=0)
    duration = None
    if rate:
        ticks = last_granule - (pre_skip or 0)
        duration = round(max(ticks, 0) / rate, 3)
    audio = pkts[_header_packet_count(codec, pkts[0]):]
    audio_bytes = sum(len(p) for p in audio)
    return {"codec": codec, "channels": channels,
            "sample_rate": rate, "pre_skip": pre_skip,
            "n_pages": sum(1 for p in pages if p["serial"] == main),
            "n_packets": len(pkts), "duration_s": duration,
            "serials": serials,
            "n_audio_packets": len(audio),
            "audio_bytes": audio_bytes,
            "mean_packet_bytes": (round(audio_bytes / len(audio), 1)
                                  if audio else 0.0),
            "max_packet_bytes": max((len(p) for p in audio),
                                    default=0),
            "bitrate_kbps": (round(audio_bytes * 8 / 1000 / duration,
                                   1) if duration else None)}


def ogg_audio_hash(data: bytes) -> str:
    """Tag-invariant content identity for an Ogg stream: md5 over the
    AUDIO packet bytes of the first logical stream — the codec header
    packets (ident + comment/tags [+ setup]) are excluded, so
    re-tagged copies of one encode collapse. Exact-stream identity
    modulo metadata (the ``mp3_audio_hash`` contract): a re-encode
    changes the hash."""
    pages = list(_pages(data))
    if not pages:
        raise ValueError("Ogg: no pages")
    main = pages[0]["serial"]
    pkts = _packets(pages, main)
    try:
        first = next(pkts)
    except StopIteration:
        raise ValueError("Ogg: stream has no packets") from None
    codec = _codec_of(first)
    skip = _header_packet_count(codec, first) - 1  # `first` already read
    h = hashlib.md5()
    for i, pk in enumerate(pkts):
        if i < skip:
            continue
        h.update(pk)
    return h.hexdigest()


def ogg_audio_packets(data: bytes) -> list[bytes]:
    """The AUDIO packets of the first logical stream, header packets
    excluded — exactly the bytes ``ogg_audio_hash`` hashes, returned
    for re-packaging (an MKV/WebM Block carries one codec packet per
    frame with headers in CodecPrivate, so feeding these to
    ``mkvcodec.build_mkv`` yields a file whose ``mkv_audio_hash``
    EQUALS this stream's ``ogg_audio_hash`` — the cross-container
    fixture plumbing)."""
    pages = list(_pages(data))
    if not pages:
        raise ValueError("Ogg: no pages")
    pkts = _packets(pages, pages[0]["serial"])
    try:
        first = next(pkts)
    except StopIteration:
        raise ValueError("Ogg: stream has no packets") from None
    skip = _header_packet_count(_codec_of(first), first) - 1
    return [pk for i, pk in enumerate(pkts) if i >= skip]


# ------------------------------------------------------------- writer

def _page(serial: int, seq: int, granule: int, htype: int,
          packets: list[bytes]) -> bytes:
    """One page carrying whole packets (each < 255*255 B; a lacing
    value of exactly 255 at a packet's end is followed by a 0)."""
    lacing = bytearray()
    body = bytearray()
    for pk in packets:
        q, r = divmod(len(pk), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pk
    if len(lacing) > _MAX_SEGS:
        raise ValueError("too many segments for one page")
    head = (b"OggS" + struct.pack("<BBqIIIB", 0, htype, granule,
                                  serial, seq, 0, len(lacing))
            + bytes(lacing))
    crc = _ogg_crc(head + bytes(body))
    return head[:22] + struct.pack("<I", crc) + head[26:] + bytes(body)


def build_ogg_stream(payload_seed: bytes, n_packets: int,
                     codec: str = "opus",
                     tags: bytes = b"",
                     extra_headers: int = 0,
                     comments: dict | None = None) -> bytes:
    """TEST/FIXTURE writer: a structurally valid single-stream Ogg
    (correct CRCs, lacing, BOS/EOS flags, header-packet layout) whose
    AUDIO packets are deterministic filler from ``payload_seed`` —
    NOT decodable audio (the ``build_frame_stream`` convention; real
    Opus/Vorbis packets would need the codecs' normative tables).
    ``tags`` varies the comment header packet — the retagged-copy
    fixture. One packet exceeds 255 bytes so lacing continuation is
    always exercised. ``codec='flac'`` emits the Ogg-FLAC mapping
    header with its DECLARED header-packet count (1 comment packet +
    ``extra_headers`` metadata packets — the seektable/padding shapes
    real encoders append), exercising the declared-count exclusion in
    ``ogg_audio_hash``."""
    # Vorbis-comment body: vendor (the `tags` bytes) + key=value
    # list (`comments`) — byte-identical to the historical zero-item
    # form when `comments` is None
    items = [f"{k}={v}".encode()
             for k, v in sorted((comments or {}).items())]
    cbody = (struct.pack("<I", len(tags)) + tags
             + struct.pack("<I", len(items))
             + b"".join(struct.pack("<I", len(i)) + i
                        for i in items))
    extra_pkts: list[bytes] = []
    if codec == "flac":
        # \x7fFLAC major minor nheaders(BE u16, excludes this packet)
        # + "fLaC" + a STREAMINFO-shaped block (not decodable audio)
        nheaders = 1 + extra_headers
        ident = (b"\x7fFLAC" + bytes([1, 0])
                 + nheaders.to_bytes(2, "big")
                 + b"fLaC" + bytes([0x00, 0, 0, 34]) + b"\x00" * 34)
        comment = (bytes([0x84, 0, 0, 4 + len(tags)])
                   + struct.pack("<I", len(tags)) + tags)
        for j in range(extra_headers):
            pad = hashlib.md5(b"hdr" + j.to_bytes(2, "big")).digest()
            extra_pkts.append(bytes([0x81, 0, 0, len(pad)]) + pad)
    elif codec == "opus":
        ident = (b"OpusHead" + bytes([1, 2])          # ver, channels
                 + struct.pack("<H", 312)             # pre-skip
                 + struct.pack("<I", 48000) + b"\x00\x00" + b"\x00")
        comment = b"OpusTags" + cbody
    elif codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
                 + struct.pack("<I", 44100)
                 + struct.pack("<iii", 0, 128000, 0) + bytes([0xB8, 1]))
        comment = b"\x03vorbis" + cbody + b"\x01"
    else:
        raise ValueError("fixture writer: opus | vorbis | flac")
    serial, out, seq = 0x5F17AB1E, bytearray(), 0
    out += _page(serial, seq, 0, 0x02, [ident])       # BOS
    seq += 1
    out += _page(serial, seq, 0, 0x00, [comment])
    seq += 1
    if codec == "vorbis":                              # setup header
        out += _page(serial, seq, 0, 0x00,
                     [b"\x05vorbis" + b"\x00" * 32])
        seq += 1
    for pk in extra_pkts:                              # flac metadata
        out += _page(serial, seq, 0, 0x00, [pk])
        seq += 1
    granule = 0
    for i in range(n_packets):
        fill = hashlib.md5(payload_seed
                           + i.to_bytes(4, "big")).digest()
        size = 300 if i == 0 else 64       # first spans a 255 lacing
        pk = (fill * (size // 16 + 1))[:size]
        granule += 960 if codec == "opus" else 1024
        eos = 0x04 if i == n_packets - 1 else 0x00
        out += _page(serial, seq, granule, eos, [pk])
        seq += 1
    return bytes(out)
