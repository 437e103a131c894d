"""H.264/AVC keyframe codec — the I_PCM subset, pure Python.

H.264 is the dominant crawl video codec, and the engine's video-dedup
chain (``sample_frames`` -> pHash) previously saw inside MJPG AVI
only. No system decoder exists in this container (libavcodec /
libopenh264 probed absent — see ``mp3codec``'s availability notes), so
this module takes the only honestly-verifiable pure-Python slice of
the spec: **I_PCM macroblocks** (ITU-T H.264 §7.3.5 / §8.3.5 — raw
uncompressed samples carried inside a spec-correct bitstream). Every
structural layer of a real H.264 parse is exercised for real:

* Annex B byte streams (start codes, §B.1), NAL unit headers (§7.3.1),
  emulation-prevention three-byte insertion/removal (§7.4.1.1);
* Exp-Golomb ue(v)/se(v) coding (§9.1) for every header field;
* SPS/PPS parsing (§7.3.2.1/2): dimensions, frame numbering, POC type,
  cropping; baseline-profile 4:2:0 streams;
* IDR slice headers (§7.3.3) incl. dec_ref_pic_marking, and the
  macroblock loop with byte-realignment before PCM samples.

Inter prediction / CAVLC / CABAC residual decoding are NOT implemented
— a coded (non-I_PCM) macroblock raises ``NotImplementedError``
loudly, never returns garbage pixels (the codec-refusal posture). The
writer emits I_PCM-only IDR streams any conforming decoder plays —
the write/read-symmetry oracle used for every container codec in this
repo (WARC/PDF/JPEG convention).

At 100 TB: frames decode inside the one streaming Arrow pass of
``sample_frames``; only pHash hex strings ever shuffle.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_h264_ipcm", "decode_h264_ipcm", "is_h264",
           "h264_frame_sampler"]

_MAX_DIM = 8192            # bomb guard: 8k x 8k frames
_MAX_FRAMES = 100_000


# ----------------------------------------------------------- bit I/O

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, val: int) -> None:            # §9.1 Exp-Golomb
        v = val + 1
        n = v.bit_length()
        self.bits.extend([0] * (n - 1))
        self.u(v, n)

    def se(self, val: int) -> None:
        self.ue(2 * val - 1 if val > 0 else -2 * val)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes_aligned(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)

    def raw_bytes(self, data: bytes) -> None:
        for b in data:
            self.u(b, 8)

    def trailing(self) -> None:                # rbsp_trailing_bits
        self.bits.append(1)
        self.align()


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                            # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bytes_at_alignment(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("truncated PCM samples")
        self.pos += 8 * n
        return self.data[start:start + n]


# ----------------------------------------------- RBSP <-> NAL escaping

def _escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (§7.4.1.1): 0x000000/1/2/3
    sequences become 0x000003xx."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_rbsp(nal: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i, n = 0, len(nal)
    while i < n:
        b = nal[i]
        if zeros >= 2 and b == 3 and i + 1 < n and nal[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    return (b"\x00\x00\x00\x01"
            + bytes([(ref_idc << 5) | nal_type])
            + _escape_rbsp(rbsp))


def _split_nals(data: bytes) -> list[bytes]:
    """NAL payloads (header byte included) between Annex B start
    codes (3- or 4-byte)."""
    out = []
    i, n = 0, len(data)
    while i < n - 2:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                j = i + 3
            elif i < n - 3 and data[i + 2] == 0 and data[i + 3] == 1:
                j = i + 4
            else:
                i += 1
                continue
            # find next start code
            k = j
            while k < n - 2:
                if data[k] == 0 and data[k + 1] == 0 and \
                        data[k + 2] in (0, 1):
                    break
                k += 1
            else:
                k = n
            out.append(data[j:k])
            i = k
        else:
            i += 1
    return out


# -------------------------------------------------------------- writer

def encode_h264_ipcm(frames: list[np.ndarray],
                     chroma: int = 128) -> bytes:
    """Annex B H.264 byte stream: SPS + PPS + one I_PCM-only IDR
    slice per GRAYSCALE frame (4:2:0, chroma planes constant
    ``chroma``). Frame dims must be multiples of 16 (whole
    macroblocks) and identical across frames. Deterministic —
    byte-identical across runs."""
    if not frames:
        raise ValueError("encode_h264_ipcm needs at least one frame")
    if len(frames) > _MAX_FRAMES:
        raise ValueError("too many frames")
    h, w = frames[0].shape[:2]
    if h % 16 or w % 16 or not h or not w:
        raise ValueError("frame dims must be non-zero multiples of 16")
    if h > _MAX_DIM or w > _MAX_DIM:
        raise ValueError("frame exceeds the size guard")
    mbs_w, mbs_h = w // 16, h // 16

    sps = _BitWriter()
    sps.u(66, 8)            # profile_idc: baseline
    sps.u(0, 8)             # constraint flags + reserved
    sps.u(30, 8)            # level_idc 3.0
    sps.ue(0)               # seq_parameter_set_id
    sps.ue(0)               # log2_max_frame_num_minus4 -> 4 bits
    sps.ue(2)               # pic_order_cnt_type 2 (no POC fields)
    sps.ue(0)               # max_num_ref_frames
    sps.u(0, 1)             # gaps_in_frame_num_value_allowed
    sps.ue(mbs_w - 1)       # pic_width_in_mbs_minus1
    sps.ue(mbs_h - 1)       # pic_height_in_map_units_minus1
    sps.u(1, 1)             # frame_mbs_only_flag
    sps.u(1, 1)             # direct_8x8_inference_flag
    sps.u(0, 1)             # frame_cropping_flag
    sps.u(0, 1)             # vui_parameters_present_flag
    sps.trailing()

    pps = _BitWriter()
    pps.ue(0)               # pic_parameter_set_id
    pps.ue(0)               # seq_parameter_set_id
    pps.u(0, 1)             # entropy_coding_mode (CAVLC)
    pps.u(0, 1)             # bottom_field_pic_order_in_frame_present
    pps.ue(0)               # num_slice_groups_minus1
    pps.ue(0)               # num_ref_idx_l0_default_active_minus1
    pps.ue(0)               # num_ref_idx_l1_default_active_minus1
    pps.u(0, 1)             # weighted_pred_flag
    pps.u(0, 2)             # weighted_bipred_idc
    pps.se(0)               # pic_init_qp_minus26
    pps.se(0)               # pic_init_qs_minus26
    pps.se(0)               # chroma_qp_index_offset
    pps.u(0, 1)             # deblocking_filter_control_present_flag
    pps.u(0, 1)             # constrained_intra_pred_flag
    pps.u(0, 1)             # redundant_pic_cnt_present_flag
    pps.trailing()

    out = bytearray(_nal(7, 3, sps.bytes_aligned()))
    out += _nal(8, 3, pps.bytes_aligned())
    cb = bytes([chroma]) * 64
    for idx, frame in enumerate(frames):
        y = np.asarray(frame, dtype=np.uint8)
        if y.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
        sl = _BitWriter()
        sl.ue(0)            # first_mb_in_slice
        sl.ue(7)            # slice_type: I (all slices of picture)
        sl.ue(0)            # pic_parameter_set_id
        sl.u(0, 4)          # frame_num (log2_max_frame_num = 4)
        sl.ue(idx % 2)      # idr_pic_id (alternates per §7.4.3)
        sl.u(0, 1)          # no_output_of_prior_pics_flag
        sl.u(0, 1)          # long_term_reference_flag
        sl.se(0)            # slice_qp_delta
        for mby in range(mbs_h):
            for mbx in range(mbs_w):
                sl.ue(25)   # mb_type I_PCM
                sl.align()  # pcm_alignment_zero_bit*
                block = y[16 * mby:16 * mby + 16,
                          16 * mbx:16 * mbx + 16]
                sl.raw_bytes(block.tobytes())
                sl.raw_bytes(cb)     # Cb 8x8
                sl.raw_bytes(cb)     # Cr 8x8
        sl.trailing()
        out += _nal(5, 3, sl.bytes_aligned())
    return bytes(out)


# -------------------------------------------------------------- reader

def is_h264(data: bytes) -> bool:
    """Annex B sniff: a start code whose first NAL is an SPS."""
    if len(data) < 6:
        return False
    for off in (3, 4):
        if data[:off] in (b"\x00\x00\x01", b"\x00\x00\x00\x01") \
                and len(data) > off and (data[off] & 0x1F) == 7:
            return True
    return False


def _parse_sps(r: "_BitReader") -> dict:
    profile = r.u(8)
    r.u(8)                   # constraint flags
    r.u(8)                   # level
    r.ue()                   # sps id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        cfmt = r.ue()        # chroma_format_idc (high profiles)
        if cfmt == 3:
            r.u(1)
        r.ue()
        r.ue()
        r.u(1)
        if r.u(1):           # seq_scaling_matrix_present
            raise NotImplementedError(
                "H.264 scaling matrices not supported "
                "(I_PCM baseline subset)")
    log2_mfn = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()               # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()                   # max_num_ref_frames
    r.u(1)
    mbs_w = r.ue() + 1
    mbs_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise NotImplementedError(
            "interlaced H.264 not supported (I_PCM baseline subset)")
    r.u(1)                   # direct_8x8_inference
    crop = [0, 0, 0, 0]
    if r.u(1):               # frame_cropping_flag
        crop = [r.ue(), r.ue(), r.ue(), r.ue()]
    return {"mbs_w": mbs_w, "mbs_h": mbs_h, "log2_mfn": log2_mfn,
            "poc_type": poc_type, "crop": crop}


def decode_h264_ipcm(data: bytes) -> dict:
    """Decode an Annex B H.264 stream whose IDR slices are I_PCM-only:
    ``{"width", "height", "frames": [grayscale uint8 (h, w)], ...}``.
    Coded (CAVLC/CABAC) macroblocks, interlaced streams, and P/B
    slices raise ``NotImplementedError`` — a loud refusal, never
    garbage pixels."""
    data = bytes(data)
    nals = _split_nals(data)
    if not nals:
        raise ValueError("no Annex B NAL units found")
    sps = None
    frames = []
    for nal in nals:
        ntype = nal[0] & 0x1F
        rbsp = _unescape_rbsp(nal[1:])
        if ntype == 7:
            sps = _parse_sps(_BitReader(rbsp))
        elif ntype in (1, 5):
            if sps is None:
                raise ValueError("slice before SPS")
            frames.append(_decode_slice(_BitReader(rbsp), sps,
                                        idr=(ntype == 5),
                                        nal_ref_idc=(nal[0] >> 5) & 0x3))
    if sps is None:
        raise ValueError("no SPS in stream")
    w, h = 16 * sps["mbs_w"], 16 * sps["mbs_h"]
    cl, cr, ct, cb = sps["crop"]
    out_frames = [f[2 * ct:h - 2 * cb, 2 * cl:w - 2 * cr]
                  for f in frames]
    return {"width": w - 2 * (cl + cr), "height": h - 2 * (ct + cb),
            "frames": out_frames, "num_frames": len(out_frames)}


def _decode_slice(r: "_BitReader", sps: dict, idr: bool,
                  nal_ref_idc: int = 0) -> np.ndarray:
    r.ue()                   # first_mb_in_slice
    slice_type = r.ue()
    if slice_type % 5 != 2:  # 2/7 = I
        raise NotImplementedError(
            "P/B slices not supported (I_PCM keyframe subset)")
    r.ue()                   # pps id
    r.u(sps["log2_mfn"])     # frame_num
    if idr:
        r.ue()               # idr_pic_id
    if sps["poc_type"] == 0:
        raise NotImplementedError(
            "pic_order_cnt_type 0 slice headers not supported")
    if idr:
        r.u(1)               # no_output_of_prior_pics
        r.u(1)               # long_term_reference_flag
    elif nal_ref_idc != 0:
        # dec_ref_pic_marking for a non-IDR reference slice (§7.3.3.3,
        # r18 ADVICE fix: skipping this field misaligned every later
        # read — a misaligned ue() landing on 25 could emit wrong
        # pixels). The sliding-window form (flag 0) is a single bit;
        # the adaptive form carries an MMCO op loop this subset
        # refuses rather than risk misparsing.
        if r.u(1):           # adaptive_ref_pic_marking_mode_flag
            raise NotImplementedError(
                "adaptive dec_ref_pic_marking (MMCO) not supported "
                "(I_PCM keyframe subset)")
    r.se()                   # slice_qp_delta
    mbs_w, mbs_h = sps["mbs_w"], sps["mbs_h"]
    y = np.zeros((16 * mbs_h, 16 * mbs_w), dtype=np.uint8)
    for mby in range(mbs_h):
        for mbx in range(mbs_w):
            mb_type = r.ue()
            if mb_type != 25:
                raise NotImplementedError(
                    f"coded macroblock (mb_type {mb_type}): only "
                    "I_PCM decodes in this pure-Python subset; "
                    "decode CAVLC/CABAC video upstream")
            r.align()
            luma = r.bytes_at_alignment(256)
            r.bytes_at_alignment(128)        # Cb + Cr (discarded)
            y[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
                np.frombuffer(luma, dtype=np.uint8).reshape(16, 16)
    return y


def h264_frame_sampler(raw: bytes, num_frames: int) -> list[bytes]:
    """``num_frames`` evenly spaced decoded frames as PPM payloads —
    the ``sample_frames`` hook (mirrors ``mjpeg_frame_sampler``):
    downstream ``decode_image`` / pHash consume them unchanged."""
    from .imagecodec import encode_ppm
    dec = decode_h264_ipcm(raw)
    frames = dec["frames"]
    if not frames:
        return []
    if num_frames < len(frames):
        # identical spacing to mjpeg_frame_sampler: the same footage
        # in different containers must sample the SAME frame indices,
        # or cross-container pHash signatures diverge by selection
        # rather than content
        idx = np.linspace(0, len(frames) - 1,
                          num_frames).round().astype(int)
        frames = [frames[i] for i in idx]
    return [encode_ppm(np.stack([f] * 3, axis=-1)) for f in frames]
