"""PDF standard security handler (empty-user-password decryption) —
pure stdlib.

A measurable slice of real PDF corpora is encrypted with an EMPTY user
password (owner-restricted printing/copying): every viewer opens them
silently, so an extraction pipeline that error-rows them drops real
content. The reference (pdf.go) has no decryption at all; this module
implements the published standard security handler from the PDF spec
(ISO 32000-1 §7.6.3, ISO 32000-2 §7.6.4) for the password-less case:

- Revisions 2-4: RC4 (40..128-bit) and AES-128-CBC (/AESV2 crypt
  filter), algorithm-2 key derivation (padded password + /O + /P +
  file ID), algorithm-4/5 /U validation, per-object MD5 keys (+sAlT
  for AES).
- Revisions 5-6 (AES-256, /AESV3): SHA-256 validation against the /U
  validation salt (R5), the hardened iterated-hash KDF of ISO 32000-2
  algorithm 2.B (R6, SHA-256/384/512 rounds keyed through AES-128-CBC),
  and the /UE file-key unwrap.

RC4 and AES (both directions — 2.B needs ENcryption) are implemented
from their public specifications; the AES S-box is GENERATED from the
GF(2^8) inverse + affine map rather than transcribed, so a typo cannot
silently corrupt it (spot-pinned in tests against FIPS-197 vectors).

A PDF whose empty user password does not validate (a real password is
required) or whose handler is outside this subset raises
:class:`PdfEncryptedError` — the typed `pdf_encrypted` classification
the pipeline surfaces as a counted error row instead of a generic parse
failure.
"""
from __future__ import annotations

import hashlib
import struct


class PdfEncryptedError(ValueError):
    """Encrypted PDF that cannot be opened without a real password, or
    with a security handler outside the implemented subset."""


_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A")


# ------------------------------------------------------------------ RC4
def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------------ AES
def _make_sbox() -> tuple[bytes, bytes]:
    """FIPS-197 S-box generated from the GF(2^8) inverse + affine map."""
    sbox = [0] * 256
    sbox[0] = 0x63
    p = q = 1
    while True:
        # p *= 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q /= 3 (multiply by the inverse of 3)
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
        if p == 1:
            break
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return bytes(sbox), bytes(inv)


_SBOX, _INV_SBOX = _make_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError(f"AES key must be 16 or 32 bytes, got {len(key)}")
    nr = nk + 6
    words = [key[4 * i:4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ _RCON[i // nk - 1], t[1], t[2], t[3]])
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r:4 * r + 4]) for r in range(nr + 1)]


def _add_rk(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(rks: list[bytes], block: bytes) -> bytes:
    st = bytearray(block)
    _add_rk(st, rks[0])
    for rnd in range(1, len(rks)):
        st = bytearray(_SBOX[st[_SHIFT[i]]] for i in range(16))
        if rnd != len(rks) - 1:
            out = bytearray(16)
            for c in range(4):
                a = st[4 * c:4 * c + 4]
                out[4 * c + 0] = _gmul(a[0], 2) ^ _gmul(a[1], 3) \
                    ^ a[2] ^ a[3]
                out[4 * c + 1] = a[0] ^ _gmul(a[1], 2) \
                    ^ _gmul(a[2], 3) ^ a[3]
                out[4 * c + 2] = a[0] ^ a[1] ^ _gmul(a[2], 2) \
                    ^ _gmul(a[3], 3)
                out[4 * c + 3] = _gmul(a[0], 3) ^ a[1] ^ a[2] \
                    ^ _gmul(a[3], 2)
            st = out
        _add_rk(st, rks[rnd])
    return bytes(st)


def _decrypt_block(rks: list[bytes], block: bytes) -> bytes:
    st = bytearray(block)
    _add_rk(st, rks[-1])
    for rnd in range(len(rks) - 2, -1, -1):
        st = bytearray(_INV_SBOX[st[_INV_SHIFT[i]]] for i in range(16))
        _add_rk(st, rks[rnd])
        if rnd != 0:
            out = bytearray(16)
            for c in range(4):
                a = st[4 * c:4 * c + 4]
                out[4 * c + 0] = _gmul(a[0], 14) ^ _gmul(a[1], 11) \
                    ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)
                out[4 * c + 1] = _gmul(a[0], 9) ^ _gmul(a[1], 14) \
                    ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)
                out[4 * c + 2] = _gmul(a[0], 13) ^ _gmul(a[1], 9) \
                    ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)
                out[4 * c + 3] = _gmul(a[0], 11) ^ _gmul(a[1], 13) \
                    ^ _gmul(a[2], 9) ^ _gmul(a[3], 14)
            st = out
    return bytes(st)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding (the 2.B KDF shape) — data must be 16-aligned."""
    if len(data) % 16:
        raise ValueError("CBC encrypt needs 16-byte-aligned input")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _encrypt_block(rks, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding strip — callers strip PKCS#7 where applicable."""
    if len(data) % 16:
        raise PdfEncryptedError("AES ciphertext not 16-byte aligned")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b
                     for a, b in zip(_decrypt_block(rks, blk), prev))
        prev = blk
    return bytes(out)


# ------------------------------------------------- the standard handler
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 algorithm 2.B (R6 hardened KDF)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


class StdSecurityHandler:
    """Empty-user-password standard security handler. Raises
    :class:`PdfEncryptedError` when the document actually needs a
    password or uses an unimplemented variant."""

    def __init__(self, enc: dict, file_id: bytes):
        filt = enc.get("/Filter")
        if filt != "/Standard":
            raise PdfEncryptedError(
                f"pdf_encrypted: security handler {filt} not supported")
        self.encrypt_metadata = enc.get("/EncryptMetadata") is not False
        self.v = int(enc.get("/V", 0) or 0)
        self.r = int(enc.get("/R", 2) or 2)
        o = enc.get("/O")
        u = enc.get("/U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfEncryptedError("pdf_encrypted: missing /O or /U")
        p = enc.get("/P", -1)
        self.p = int(p) & 0xFFFFFFFF
        self.length = int(enc.get("/Length", 40) or 40)
        self.aes = False          # streams/strings use AES-CBC
        self.identity = False     # V4 /Identity: no encryption

        if self.v in (1, 2) or (self.v == 4 and self.r in (2, 3, 4)):
            if self.v == 4:
                self._load_v4_filters(enc)
            self._auth_rc4_family(o, u, file_id)
        elif self.v == 5 and self.r in (5, 6):
            self._auth_aes256(enc, o, u)
            self.aes = True
        else:
            raise PdfEncryptedError(
                f"pdf_encrypted: /V {self.v} /R {self.r} not supported")

    # -- V1/V2/V4 (RC4 / AES-128) ------------------------------------
    def _load_v4_filters(self, enc: dict) -> None:
        cf = enc.get("/CF") or {}
        stmf = enc.get("/StmF", "/Identity")
        strf = enc.get("/StrF", "/Identity")
        if stmf != strf:
            raise PdfEncryptedError(
                "pdf_encrypted: split /StmF and /StrF not supported")
        if stmf == "/Identity":
            self.identity = True
            return
        spec = cf.get(stmf)
        if not isinstance(spec, dict):
            raise PdfEncryptedError(
                f"pdf_encrypted: crypt filter {stmf} undefined")
        cfm = spec.get("/CFM")
        if cfm == "/AESV2":
            self.aes = True
        elif cfm != "/V2":
            raise PdfEncryptedError(
                f"pdf_encrypted: crypt filter method {cfm} not supported")
        if "/Length" in spec:
            n = int(spec["/Length"])
            self.length = n * 8 if n <= 40 else n  # bytes or bits

    def _auth_rc4_family(self, o: bytes, u: bytes, file_id: bytes) -> None:
        if self.v == 1:
            self.length = 40
        n = self.length // 8
        if not 5 <= n <= 16:
            raise PdfEncryptedError(
                f"pdf_encrypted: key length {self.length} bits")
        h = hashlib.md5()
        h.update(_PAD)                       # empty user password, padded
        h.update(o[:32])
        h.update(struct.pack("<I", self.p))
        h.update(file_id)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")    # algorithm 2 step f
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        self.key = key[:n]
        # algorithm 4/5: validate /U against the empty password
        if self.r == 2:
            expect = rc4(self.key, _PAD)
            ok = expect == u[:32]
        else:
            tmp = hashlib.md5(_PAD + file_id).digest()
            out = rc4(self.key, tmp)
            for i in range(1, 20):
                out = rc4(bytes(b ^ i for b in self.key), out)
            ok = out[:16] == u[:16]
        if not ok:
            raise PdfEncryptedError(
                "pdf_encrypted: user password required")

    # -- V5 (AES-256) --------------------------------------------------
    def _auth_aes256(self, enc: dict, o: bytes, u: bytes) -> None:
        if len(u) < 48:
            raise PdfEncryptedError("pdf_encrypted: short /U for R5/R6")
        vsalt, ksalt = u[32:40], u[40:48]
        if self.r == 5:
            digest = hashlib.sha256(b"" + vsalt).digest()
            inter = hashlib.sha256(b"" + ksalt).digest()
        else:
            digest = _hash_2b(b"", vsalt)
            inter = _hash_2b(b"", ksalt)
        if digest != u[:32]:
            raise PdfEncryptedError(
                "pdf_encrypted: user password required")
        ue = enc.get("/UE")
        if not isinstance(ue, bytes) or len(ue) < 32:
            raise PdfEncryptedError("pdf_encrypted: missing /UE")
        self.key = aes_cbc_decrypt(inter, b"\x00" * 16, ue[:32])

    # -- per-object decryption ----------------------------------------
    def object_key(self, num: int, gen: int) -> bytes:
        if self.v == 5:
            return self.key  # AES-256 uses the file key directly
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if self.aes:
            h.update(b"sAlT")
        return h.digest()[:min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.identity or not data:
            return data
        key = self.object_key(num, gen)
        if self.aes or self.v == 5:
            if len(data) < 16:
                raise PdfEncryptedError("AES data shorter than its IV")
            out = aes_cbc_decrypt(key, data[:16], data[16:])
            pad = out[-1] if out else 0
            if not 1 <= pad <= 16 or len(out) < pad:
                raise PdfEncryptedError("bad AES padding")
            return out[:-pad]
        return rc4(key, data)


