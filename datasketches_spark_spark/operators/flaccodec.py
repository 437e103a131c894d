"""Pure-Python/numpy FLAC codec (the xiph.org free lossless audio format).

FLAC's entropy layer is Rice coding over predictor residuals — no
dictionary or arithmetic machinery — so, like GIF's LZW, it is small
enough to implement directly and the decode is bit-exact by
construction (lossless format).

Scope:

* decode: STREAMINFO + frame stream; CONSTANT / VERBATIM / FIXED
  (orders 0-4) / LPC (orders 1-32) subframes; partitioned Rice
  residuals (both 4- and 5-bit parameter variants, incl. escape codes);
  mono and stereo with all four channel assignments (independent,
  left/side, right/side, mid/side); 8/16/24-bit samples; wasted bits;
  frame-header CRC-8 and frame CRC-16 verified; unknown-length streams
  (STREAMINFO total_samples 0) end at the first non-sync byte-aligned
  tail. Variable-blocksize streams and >2 channels refuse by name.
* encode: FLAC streams with CONSTANT, VERBATIM, or FIXED-predictor
  subframes and single-partition Rice residuals, real header CRC-8 /
  frame CRC-16 and all UTF-8 frame-number forms — spec-compliant
  decoders (libFLAC, ffmpeg) accept the output (LPC modeling is a
  quality lever, not a correctness one, and is left out).

Per-sample Rice decode runs in Python; cost is a few bit operations per
sample on payloads that arrive pre-partitioned through Arrow batches —
the same budget as the GIF LZW path.

No counterpart in the reference (no multimodal surface); closes the
compressed-audio gap the way jpeg/png/gif closed images.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["crc8", "crc16", "decode_flac", "encode_flac", "flac_info",
           "is_flac"]


def _crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)       # x^8+x^2+x+1, init 0
_CRC16_TABLE = _crc_table(0x8005, 16)   # x^16+x^15+x^2+1, init 0


def crc8(data: bytes) -> int:
    """FLAC frame-header CRC-8 (poly 0x07, init 0) — spec-compliant
    decoders use it for sync validation."""
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def crc16(data: bytes) -> int:
    """FLAC frame CRC-16 (poly 0x8005, init 0) over the whole frame up to
    the CRC field."""
    r = 0
    for b in data:
        r = _CRC16_TABLE[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r

_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                 4: [4, -6, 4, -1]}

_BLOCKSIZE_TABLE = [0, 192, 576, 1152, 2304, 4608, 0, 0,
                    256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
_RATE_TABLE = [0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
               32000, 44100, 48000, 96000, 0, 0, 0, 0]
_DEPTH_TABLE = [0, 8, 12, 0, 16, 20, 24, 32]


def is_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC: truncated stream")
        first = self.pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        chunk >>= (last * 8) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits until the terminating 1."""
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1_000_000:
                raise ValueError("FLAC: runaway unary code")
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _rice_read(bits: _Bits, param: int) -> int:
    q = bits.unary()
    r = bits.read(param) if param else 0
    u = (q << param) | r
    return (u >> 1) ^ -(u & 1)  # zigzag


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC frame-header UTF-8-style coded number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("FLAC: bad frame number coding")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad frame number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residuals(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError("FLAC: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC: partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            out.extend(bits.read_signed(raw) if raw else 0
                       for _ in range(n))
        else:
            out.extend(_rice_read(bits, param) for _ in range(n))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, depth: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("FLAC: subframe sync bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
        depth -= wasted
    if stype == 0:  # CONSTANT
        v = bits.read_signed(depth)
        out = np.full(blocksize, v, np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([bits.read_signed(depth)
                        for _ in range(blocksize)], np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [bits.read_signed(depth) for _ in range(order)]
        res = _read_residuals(bits, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFFS[order]
        for i in range(order, blocksize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out[i] = res[i - order] + pred
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [bits.read_signed(depth) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision escape")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _read_residuals(bits, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(out[i - 1 - j])
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        out = out << wasted
    return out


def flac_info(data: bytes) -> dict:
    """STREAMINFO metadata: sample_rate, channels, bits_per_sample,
    total_samples."""
    data = bytes(data)
    if not is_flac(data):
        raise ValueError("not a FLAC stream (missing fLaC signature)")
    pos = 4
    while pos < len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        if btype == 0:  # STREAMINFO
            block = data[pos + 4:pos + 4 + size]
            bits = _Bits(block)
            bits.read(16)  # min blocksize
            bits.read(16)  # max blocksize
            bits.read(24)
            bits.read(24)
            rate = bits.read(20)
            ch = bits.read(3) + 1
            depth = bits.read(5) + 1
            total = bits.read(36)
            return {"sample_rate": rate, "channels": ch,
                    "bits_per_sample": depth, "total_samples": total}
        pos += 4 + size
        if hdr & 0x80:
            break
    raise ValueError("FLAC: missing STREAMINFO")


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to ``(samples: float64 (n, channels) in [-1, 1],
    sample_rate)`` — the same contract as ``audiocodec.decode_wav``."""
    data = bytes(data)
    info = flac_info(data)
    if info["channels"] > 2:
        raise NotImplementedError("FLAC: > 2 channels not supported")
    # skip metadata blocks
    pos = 4
    while True:
        hdr = data[pos]
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        pos += 4 + size
        if hdr & 0x80:
            break
    bits = _Bits(data, pos * 8)
    chans: list[list[np.ndarray]] = [[] for _ in range(info["channels"])]
    total = 0
    want = info["total_samples"]
    while (want == 0 or total < want) and bits.pos < len(data) * 8 - 16:
        frame_start = bits.pos >> 3
        sync = bits.read(14)
        if sync != 0x3FFE:
            if want == 0 and (bits.pos - 14) % 8 == 0:
                # STREAMINFO total_samples 0 is the legal "unknown" value:
                # a non-sync byte-aligned tail (padding, ID3v1, ...) after
                # the last frame is end-of-stream, not corruption
                break
            raise ValueError("FLAC: lost frame sync")
        bits.read(1)  # reserved
        blocking = bits.read(1)
        if blocking != 0:
            raise NotImplementedError(
                "FLAC: variable-blocksize streams not supported")
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        ch_code = bits.read(4)
        depth_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
            if blocksize == 0:
                raise ValueError("FLAC: reserved blocksize code")
        if rate_code == 12:
            bits.read(8)
        elif rate_code in (13, 14):
            bits.read(16)
        depth = (_DEPTH_TABLE[depth_code]
                 if depth_code else info["bits_per_sample"])
        if depth == 0:
            raise ValueError("FLAC: reserved sample-depth code")
        hdr_end = bits.pos >> 3  # header fields are whole bytes
        if bits.read(8) != crc8(data[frame_start:hdr_end]):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            if nch != info["channels"]:
                raise ValueError("FLAC: frame/stream channel mismatch")
            subs = [_decode_subframe(bits, blocksize, depth)
                    for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(bits, blocksize, depth)
            side = _decode_subframe(bits, blocksize, depth + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(bits, blocksize, depth + 1)
            right = _decode_subframe(bits, blocksize, depth)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(bits, blocksize, depth)
            side = _decode_subframe(bits, blocksize, depth + 1)
            left = (((mid << 1) | (side & 1)) + side) >> 1
            subs = [left, left - side]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        bits.align()
        if bits.read(16) != crc16(data[frame_start:(bits.pos - 16) >> 3]):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c, s in zip(chans, subs):
            c.append(s)
        total += blocksize
    if not chans[0]:
        raise ValueError("FLAC: no audio frames")
    arrs = [np.concatenate(c) for c in chans]
    if want:
        arrs = [a[:want] for a in arrs]
    scale = float(1 << (info["bits_per_sample"] - 1))
    x = np.stack(arrs, axis=1).astype(np.float64) / scale
    return x, info["sample_rate"]


# ----------------------------------------------------------------- encode

class _BitW:
    __slots__ = ("out", "cur", "n")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, v: int, bits: int):
        self.cur = (self.cur << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.cur >> self.n) & 0xFF)
        self.cur &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _rice_write(w: _BitW, v: int, param: int):
    u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
    q = u >> param
    w.write(0, q) if q else None
    w.write(1, 1)
    if param:
        w.write(u & ((1 << param) - 1), param)


def _best_rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.abs(res).mean())
    p = 0
    while (1 << p) < mean and p < 14:
        p += 1
    return p


def raw_samples_md5(q: np.ndarray, bits_per_sample: int) -> bytes:
    """The STREAMINFO content signature (FLAC spec §streaminfo): MD5
    of the raw interleaved little-endian signed samples — the
    spec-defined CONTENT identity of the audio, independent of how it
    was compressed. Exposed so content-dedup can recompute it from
    decoded samples (the decode path cross-checks the encode path)."""
    import hashlib
    nbytes = bits_per_sample // 8
    inter = np.ascontiguousarray(q.astype("<i8"))
    raw = inter.view(np.uint8).reshape(q.shape[0], q.shape[1], 8)
    return hashlib.md5(raw[:, :, :nbytes].tobytes()).digest()


def encode_flac(samples: np.ndarray, sample_rate: int,
                bits_per_sample: int = 16,
                block_size: int = 4096,
                tags: dict | None = None) -> bytes:
    """Encode ``(n,)`` or ``(n, channels<=2)`` float64 in [-1, 1] to a
    FLAC stream (independent channels, FIXED predictors with
    single-partition Rice residuals; picks the cheapest of orders 0-2
    per subframe). Lossless for values representable at
    ``bits_per_sample``. r17: STREAMINFO carries the spec-defined MD5
    of the raw samples (the container-independent content identity
    ``audio_content_hash`` keys on), and ``tags`` writes a
    VORBIS_COMMENT metadata block (the re-tagged-copy fixture for
    tag-invariant dedup)."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if nch > 2:
        raise ValueError("FLAC encoder: <= 2 channels")
    scale = 1 << (bits_per_sample - 1)
    q = np.clip(np.round(x * scale), -scale, scale - 1).astype(np.int64)

    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    si.out += raw_samples_md5(q, bits_per_sample)
    last = 0x80 if tags is None else 0x00
    out += bytes([last]) + struct.pack(">I", len(si.out))[1:] + si.out
    if tags is not None:
        # VORBIS_COMMENT (type 4): vendor string + key=value list,
        # little-endian length prefixes (the Vorbis comment spec)
        body = bytearray()
        vendor = b"datasketches-spark-spark"
        body += struct.pack("<I", len(vendor)) + vendor
        items = [f"{k}={v}".encode() for k, v in sorted(tags.items())]
        body += struct.pack("<I", len(items))
        for it in items:
            body += struct.pack("<I", len(it)) + it
        out += bytes([0x80 | 4]) + struct.pack(">I", len(body))[1:]             + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = q[start:start + block_size]
        bs = blk.shape[0]
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # blocksize: 16-bit at end of header
        w.write(0, 4)  # rate: from STREAMINFO
        w.write(nch - 1, 4)
        w.write({8: 1, 16: 4, 24: 6}.get(bits_per_sample, 0), 3)
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(bs - 1, 16)
        # header fields are whole bytes, so w.out holds exactly the header
        w.write(crc8(bytes(w.out)), 8)
        for c in range(nch):
            ch = blk[:, c]
            # pick the cheapest of constant / fixed 0-2
            if bs and np.all(ch == ch[0]):
                w.write(0, 1)
                w.write(0, 6)  # CONSTANT
                w.write(0, 1)
                w.write(int(ch[0]), bits_per_sample)
                continue
            best = None
            for order in (0, 1, 2):
                if bs <= order:
                    continue
                res = ch.copy()
                for _ in range(order):
                    res = np.diff(res)
                cost = int(np.abs(res).sum())
                if best is None or cost < best[1]:
                    best = (order, cost, res)
            order, _, res = best
            w.write(0, 1)
            w.write(8 + order, 6)  # FIXED order
            w.write(0, 1)
            for i in range(order):
                w.write(int(ch[i]), bits_per_sample)
            w.write(0, 2)   # residual method: 4-bit Rice
            w.write(0, 4)   # partition order 0
            param = _best_rice_param(res)
            w.write(param, 4)
            for v in res:
                _rice_write(w, int(v), param)
        w.align()
        w.write(crc16(bytes(w.out)), 16)
        out += w.out
        frame_no += 1
    return bytes(out)


def _write_utf8_number(w: _BitW, fn: int) -> None:
    """FLAC frame-header UTF-8-style coded number, all 1-7 byte forms
    (frame index capacity 36 bits)."""
    if fn < 0x80:
        w.write(fn, 8)
        return
    if fn >= 1 << 36:
        raise ValueError("FLAC encoder: frame number exceeds 36 bits")
    k = next(k for k in range(1, 7) if fn < 1 << (5 * k + 6))
    w.write((0x100 - (1 << (7 - k))) | (fn >> (6 * k)), 8)
    for i in range(k - 1, -1, -1):
        w.write(0x80 | ((fn >> (6 * i)) & 0x3F), 8)
