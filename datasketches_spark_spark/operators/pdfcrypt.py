"""PDF standard security handler (ISO 32000-1/2 §7.6) — the
EMPTY-USER-PASSWORD case.

A large share of wild encrypted PDFs are "owner-restricted" only: the
user password is EMPTY (the document opens in any viewer without a
prompt; encryption exists to express print/copy permissions), and the
published standard-security-handler algorithms decrypt them with no
secret at all. This module implements exactly that public surface:

* key derivation Algorithm 2 (R2/R3/R4 — RC4 and AES-128 documents)
  and the R5/R6 SHA-2 scheme incl. the Algorithm 2.B iterated hash
  (AES-256 documents, PDF 2.0 / Adobe ExtensionLevel 8);
* user-password VALIDATION against /U (Algorithms 4, 5, 11) — a real
  (non-empty) user password still refuses loudly upstream;
* per-object keys (Algorithm 1: MD5 over objnum/gen, the ``sAlT``
  suffix for AESV2) and stream decryption (RC4, or AES-CBC with the
  16-byte IV prefix and PKCS#5 padding per §7.6.2).

RC4 and all hashes are stdlib; AES comes from the ``cryptography``
package behind an import-try — if absent, AES documents keep the loud
``NotImplementedError`` refusal (never silent garbage).

The deterministic writer side (``_make_writer_handler``, consumed by
``pdfcodec.encode_pdf_text_encrypted``) applies the same handler in
the forward direction — fixture generation for the write/read-symmetry
convention (no PDF tool exists in this container): fixed /ID, fixed
validation/key salts, and per-object IVs derived from object numbers,
all spec-legal (randomness is a hygiene recommendation, not a validity
requirement). Both sides take an optional USER PASSWORD, so callers
that know a document's real password can decrypt it
(``pdf_text(data, password=...)`` / the operator's ``password=``);
only an unknown non-empty password refuses.

Reference parity note: the reference engine (1,856 LoC of Scala UDF
registration) has no document ingestion at all — this is engine
extension surface for crawl pipelines, built from the public spec.
"""

from __future__ import annotations

import hashlib
import re
import struct

__all__ = ["StandardDecryptor", "build_decryptor", "aes_available"]

# §7.6.3.3 Algorithm 2 padding string (public normative constant)
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def aes_available() -> bool:
    try:
        from cryptography.hazmat.primitives.ciphers import Cipher  # noqa
        return True
    except ImportError:
        return False


def _aes_cbc(key: bytes, iv: bytes, data: bytes,
             encrypt: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes)
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def _aes_ecb(key: bytes, data: bytes, encrypt: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes)
    c = Cipher(algorithms.AES(key), modes.ECB())
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


# RC4 keystream generation is inherently per-byte sequential and runs
# in pure Python (the cryptography package dropped ARC4 from its
# supported set); the XOR is vectorized with numpy, but a pathological
# single RC4 stream near the general 256 MiB bomb guard would still
# cost minutes of interpreter time in the Arrow worker path (r18,
# ADVICE fix). Real-world RC4-era PDFs (pre-2006 handlers) keep
# streams far below this; refuse loudly above it.
_RC4_MAX = 64 * 1024 * 1024


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 is its own inverse — used for both directions. Keystream
    bytes come from the sequential PRGA loop; the data XOR is one
    vectorized numpy op."""
    if len(data) > _RC4_MAX:
        raise ValueError(
            f"RC4 stream of {len(data)} bytes exceeds the "
            f"{_RC4_MAX >> 20} MiB pure-Python RC4 guard")
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    ks = bytearray(len(data))
    i = j = 0
    for n in range(len(data)):
        i = (i + 1) & 0xFF
        sj = S[j := (j + S[i]) & 0xFF]
        S[j] = S[i]
        S[i] = sj
        ks[n] = S[(sj + S[j]) & 0xFF]
    import numpy as _np
    return (_np.frombuffer(data, dtype=_np.uint8)
            ^ _np.frombuffer(bytes(ks), dtype=_np.uint8)).tobytes()


# --------------------------------------------------- R2/R3/R4 (MD5 era)

def _algorithm2(password: bytes, o_entry: bytes, p: int, id0: bytes,
                r: int, n: int, encrypt_metadata: bool) -> bytes:
    """§7.6.3.3 Algorithm 2: the file encryption key, R2-R4."""
    h = hashlib.md5()
    h.update((password + _PAD)[:32])
    h.update(o_entry[:32])
    # /P is SIGNED in the spec but wild writers store the same bit
    # pattern unsigned (e.g. 4294963392 for -3904): only the low 32
    # bits enter the key, so mask instead of crashing in struct.pack
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _algorithm3_o(owner_pw: bytes, user_pw: bytes, r: int,
                  n: int) -> bytes:
    """§7.6.3.4 Algorithm 3: the /O entry (writer side)."""
    key = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = _rc4(key, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def _algorithm45_u(file_key: bytes, id0: bytes, r: int) -> bytes:
    """§7.6.3.4 Algorithms 4 (R2) / 5 (R3+): the /U entry."""
    if r == 2:
        return _rc4(file_key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = _rc4(file_key, h)
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16        # arbitrary 16-byte tail (§ Alg 5 f)


# ------------------------------------------------------ R5/R6 (SHA era)

def _hash_2b(password: bytes, salt: bytes, udata: bytes,
             r: int) -> bytes:
    """§7.6.4.3.4 Algorithm 2.B (R6) / plain SHA-256 (R5)."""
    k = hashlib.sha256(password + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        # big-endian int of E[:16] mod 3 == byte-sum mod 3 (256 = 1 mod 3)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


# ------------------------------------------------------------ decryptor

class StandardDecryptor:
    """Holds the validated file key + scheme; decrypts stream bytes."""

    def __init__(self, file_key: bytes, method: str, r: int,
                 encrypt_metadata: bool = True):
        if method not in ("rc4", "aesv2", "aesv3", "identity"):
            raise ValueError(f"unknown crypt method {method!r}")
        self.file_key = file_key
        self.method = method
        self.r = r
        self.encrypt_metadata = encrypt_metadata

    def _object_key(self, num: int, gen: int) -> bytes:
        """§7.6.2 Algorithm 1 per-object key (V < 5 only)."""
        if self.method == "aesv3":
            return self.file_key          # AES-256: file key direct
        h = hashlib.md5()
        h.update(self.file_key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if self.method == "aesv2":
            h.update(b"sAlT")
        return h.digest()[:min(len(self.file_key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.method == "identity":
            return data
        key = self._object_key(num, gen)
        if self.method == "rc4":
            return _rc4(key, data)
        # AES-CBC: 16-byte IV prefix, PKCS#5 padding (§7.6.2)
        if len(data) < 16 or len(data) % 16:
            raise ValueError("AES stream not block-aligned")
        plain = _aes_cbc(key, data[:16], data[16:], encrypt=False)
        padn = plain[-1] if plain else 0
        if not 1 <= padn <= 16:
            raise ValueError("bad AES padding")
        return plain[:-padn]

    def encrypt(self, data: bytes, num: int, gen: int,
                iv: bytes | None = None) -> bytes:
        if self.method == "identity":
            return data
        key = self._object_key(num, gen)
        if self.method == "rc4":
            return _rc4(key, data)
        iv = iv or hashlib.md5(b"dss-iv-%d-%d" % (num, gen)).digest()
        padn = 16 - (len(data) % 16)
        return iv + _aes_cbc(key, iv, data + bytes([padn]) * padn,
                             encrypt=True)


# ------------------------------------------------- /Encrypt dict parse

def _pdf_string_at(body: bytes, pos: int):
    """(bytes, end) for a literal or hex string starting at ``pos``."""
    from .pdfcodec import _hex_string, _literal_string
    c = body[pos:pos + 1]
    if c == b"(":
        return _literal_string(body, pos)
    if c == b"<":
        return _hex_string(body, pos)
    return None, pos


def _dict_string(body: bytes, name: bytes) -> bytes | None:
    m = re.search(rb"/" + name + rb"\s*([(<])", body)
    if not m:
        return None
    s, _ = _pdf_string_at(body, m.start(1))
    return s


def _dict_int(body: bytes, name: bytes, default=None):
    m = re.search(rb"/" + name + rb"\s+([-+]?\d+)", body)
    return int(m.group(1)) if m else default


def _first_id(data: bytes) -> bytes:
    """First element of the trailer /ID array (hex or literal)."""
    for m in re.finditer(rb"/ID\s*\[\s*([(<])", data):
        s, _ = _pdf_string_at(data, m.start(1))
        if s is not None:
            return s
    return b""


def _encrypt_dict_bytes(data: bytes) -> bytes | None:
    """Locate the /Encrypt dictionary body: inline ``/Encrypt <<..>>``
    or an indirect ``/Encrypt N G R`` resolved against ``N G obj``.
    The Encrypt dict itself is never encrypted (§7.6.1). Matches are
    resolved LAST-wins (r18, ADVICE fix): incrementally-updated PDFs
    carry multiple trailers and object generations, and the
    document-order-last trailer/definition is the live one — the same
    rule ``pdfcodec._document_model`` applies to ordinary objects."""
    m = None
    for m in re.finditer(rb"/Encrypt\s*<<", data):
        pass
    if m:
        from .pdfcodec import _literal_string
        start = m.end() - 2
        depth, pos = 0, start
        limit = min(len(data), start + 65536)
        while pos < limit - 1:
            c = data[pos:pos + 1]
            two = data[pos:pos + 2]
            if c == b"(":
                # /O, /U etc. are literal strings of raw binary that
                # can contain '>>' bytes — skip the whole string span
                # instead of letting it unbalance the depth scan
                _s, pos = _literal_string(data, pos)
            elif two == b"<<":
                depth += 1
                pos += 2
            elif two == b">>":
                depth -= 1
                pos += 2
                if depth == 0:
                    return data[start:pos]
            elif c == b"<":
                j = data.find(b">", pos + 1, limit)
                pos = (j + 1) if j >= 0 else pos + 1
            else:
                pos += 1
        return None
    m = None
    for m in re.finditer(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R\b", data):
        pass
    if not m:
        return None
    num, gen = int(m.group(1)), int(m.group(2))
    om = None
    for om in re.finditer(
            rb"(?<![0-9])%d\s+%d\s+obj\b" % (num, gen), data):
        pass
    if not om:
        return None
    end = data.find(b"endobj", om.end())
    return data[om.end():end if end >= 0 else len(data)]


def build_decryptor(data: bytes,
                    password: bytes = b"") -> StandardDecryptor | None:
    """A validated :class:`StandardDecryptor` for the document, or
    ``None`` when this handler cannot open it (non-Standard filter,
    unsupported V/R, wrong password, or AES without the cryptography
    package) — callers keep their loud refusal on ``None``."""
    enc = _encrypt_dict_bytes(data)
    if enc is None:
        return None
    fm = re.search(rb"/Filter\s*/(\w+)", enc)
    if not fm or fm.group(1) != b"Standard":
        return None
    v = _dict_int(enc, b"V", 0)
    r = _dict_int(enc, b"R", 2)
    o = _dict_string(enc, b"O")
    u = _dict_string(enc, b"U")
    p = _dict_int(enc, b"P", -1)
    if o is None or u is None:
        return None
    em = re.search(rb"/EncryptMetadata\s+(true|false)", enc)
    encrypt_metadata = not (em and em.group(1) == b"false")

    if v in (1, 2) or (v == 4 and r in (3, 4)):
        # top-level /Length is in BITS (40..128); V4 crypt-filter
        # /Length fields are in BYTES in the wild — normalize small
        # values rather than mis-deriving a 2-byte key
        ln = _dict_int(enc, b"Length", 40)
        if ln <= 32:
            ln *= 8
        n = 5 if r == 2 else max(5, min(16, ln // 8))
        method = "rc4"
        if v == 4:
            stmf = re.search(rb"/StmF\s*/(\w+)", enc)
            if stmf and stmf.group(1) == b"Identity":
                # streams unencrypted by declaration (§7.6.5); key
                # still validates so the refusal/accept decision is
                # honest
                cfm = None
                method = "identity"
            else:
                cfm = re.search(rb"/CFM\s*/(\w+)", enc)
            if cfm and cfm.group(1) == b"AESV2":
                if not aes_available():
                    return None
                method = "aesv2"
                n = 16          # AES-128: the key is always 16 bytes
            elif cfm and cfm.group(1) == b"V2":
                method = "rc4"
            elif cfm and cfm.group(1) == b"None":
                method = "identity"
            elif cfm:
                return None
        id0 = _first_id(data)
        key = _algorithm2(password, o, p, id0, r, n, encrypt_metadata)
        expect = _algorithm45_u(key, id0, r)
        got = u[:16] if r >= 3 else u[:32]
        if expect[:len(got)] != got:
            return None               # real user password required
        return StandardDecryptor(key, method, r, encrypt_metadata)

    if v == 5 and r in (5, 6):
        if not aes_available():
            return None
        if len(u) < 48:
            return None
        ue = _dict_string(enc, b"UE")
        if ue is None or len(ue) < 32:
            return None
        vsalt, ksalt = u[32:40], u[40:48]
        if _hash_2b(password, vsalt, b"", r) != u[:32]:
            return None               # real user password required
        ikey = _hash_2b(password, ksalt, b"", r)
        fkey = _aes_cbc(ikey, b"\x00" * 16, ue[:32], encrypt=False)
        # /Perms integrity check (§7.6.4.4.8): decrypting it with the
        # file key must reveal the 'adb' marker — an INDEPENDENT
        # validation of the derived key (not just the U hash chain).
        # Absent or malformed /Perms is tolerated (some producers omit
        # it); a PRESENT Perms that fails the marker means the key is
        # wrong and the document must refuse.
        perms = _dict_string(enc, b"Perms")
        if perms is not None and len(perms) >= 16:
            dec = _aes_ecb(fkey, perms[:16], encrypt=False)
            if dec[9:12] != b"adb":
                return None
        return StandardDecryptor(fkey, "aesv3", r, encrypt_metadata)

    return None


# ------------------------------------------------------------- writer

_FIXED_ID = hashlib.md5(b"dss-encrypted-fixture").digest()


def _make_writer_handler(scheme: str, user_pw: bytes = b""):
    """(handler, encrypt_dict_bytes) for a deterministic document —
    empty user password by default (the owner-restrictions-only wild
    shape); pass ``user_pw`` to mint a REAL-password fixture (the
    reader then needs the same password)."""
    p = -44     # typical owner-restriction permission bits
    id0 = _FIXED_ID
    if scheme in ("rc4", "aes128"):
        r = 3 if scheme == "rc4" else 4
        v = 2 if scheme == "rc4" else 4
        n = 16
        o = _algorithm3_o(user_pw, user_pw, r, n)
        key = _algorithm2(user_pw, o, p, id0, r, n, True)
        u = _algorithm45_u(key, id0, r)
        method = "rc4" if scheme == "rc4" else "aesv2"
        extra = b""
        if scheme == "aes128":
            extra = (b" /CF << /StdCF << /CFM /AESV2 /AuthEvent "
                     b"/DocOpen /Length 16 >> >> /StmF /StdCF "
                     b"/StrF /StdCF")
        enc = (b"<< /Filter /Standard /V %d /R %d /Length 128 /P %d"
               b" /O <%s> /U <%s>%s >>"
               % (v, r, p, o.hex().encode(), u.hex().encode(), extra))
        return StandardDecryptor(key, method, r), enc
    if scheme == "aes256":
        r = 6
        fkey = hashlib.sha256(b"dss-aes256-file-key").digest()
        uvs = hashlib.md5(b"dss-uvs").digest()[:8]
        uks = hashlib.md5(b"dss-uks").digest()[:8]
        u = _hash_2b(user_pw, uvs, b"", r) + uvs + uks
        ue = _aes_cbc(_hash_2b(user_pw, uks, b"", r), b"\x00" * 16,
                      fkey, encrypt=True)
        ovs = hashlib.md5(b"dss-ovs").digest()[:8]
        oks = hashlib.md5(b"dss-oks").digest()[:8]
        o = _hash_2b(user_pw, ovs, u, r) + ovs + oks
        oe = _aes_cbc(_hash_2b(user_pw, oks, u, r), b"\x00" * 16,
                      fkey, encrypt=True)
        perms = _aes_ecb(fkey, struct.pack("<i", p)
                         + b"\xff\xff\xff\xffTadb\x00\x00\x00\x00",
                         encrypt=True)
        enc = (b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d"
               b" /O <%s> /U <%s> /OE <%s> /UE <%s> /Perms <%s>"
               b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen"
               b" /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>"
               % (p, o.hex().encode(), u.hex().encode(),
                  oe.hex().encode(), ue.hex().encode(),
                  perms.hex().encode()))
        return StandardDecryptor(fkey, "aesv3", r), enc
    raise ValueError(f"unknown scheme {scheme!r} "
                     "(rc4 | aes128 | aes256)")
