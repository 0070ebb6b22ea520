"""PDF standard security handler — RC4, AES-128 (AESV2), AES-256 (R6).

A meaningful share of real web PDFs are "protected": encrypted with an
owner password but an EMPTY user password, which every reader silently
opens.  This module implements the standard security handler from the
public PDF spec (ISO 32000-1 §7.6, plus the AES-256 / R6 revision from
ISO 32000-2) for exactly that case:

* **Ciphers**: RC4 (any key length) and a pure-Python AES-128/192/256
  (FIPS-197 tables generated at import, vector-pinned in tests) with
  CBC and the PDF padding conventions.
* **Key derivation**: Algorithm 2 (R2/R3/R4 — padded password, /O, /P,
  first /ID element, 50-fold MD5 strengthening), per-object keys
  (Algorithm 1, incl. the ``sAlT`` suffix for AESV2), and the R6
  Algorithm 2.A/2.B iterated SHA-256/384/512 + AES-CBC hash with the
  /UE-wrapped file key.
* **Crypt filters** (/V 4-5): /StdCF with /CFM V2 (RC4), AESV2, AESV3.
* **Encryption side** too — the writer in ``pdfwrite.py`` uses it to
  emit encrypted differential families, so decrypt is pinned the same
  way as every other container mechanism: independent encrypt path →
  identical extracted spans (no PDF validator exists in-container).

Password handling: a caller-supplied password (plumbed through
``PdfDocument(data, password=...)`` and the Spark operators) is tried
as the USER password, then as the OWNER password (Algorithm 7 /O
recovery for R2-R4; /OE unwrap for R6), with the empty user password
as the final fallback.  Files whose password is not supplied decode
to nothing — cracking is out of scope by design.
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

from .pdfparse import PdfError

__all__ = ["rc4", "AES", "aes_cbc_encrypt", "aes_cbc_decrypt", "StdSecurity"]


# --------------------------------------------------------------------- #
# RC4


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % kl]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------- #
# AES (FIPS-197), tables generated at import


def _aes_tables():
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= ((x << 1) ^ (0x11B if x & 0x80 else 0)) & 0xFF  # x *= 3
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def rotl8(v, n):
        return ((v << n) | (v >> (8 - n))) & 0xFF

    sbox = [0] * 256
    for b in range(256):
        inv = exp[255 - log[b]] if b else 0
        sbox[b] = (
            inv ^ rotl8(inv, 1) ^ rotl8(inv, 2) ^ rotl8(inv, 3) ^ rotl8(inv, 4) ^ 0x63
        )
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    return sbox, inv_sbox, gmul


_SBOX, _INV_SBOX, _GMUL = _aes_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8]


def _round_tables():
    """T-table round tables (the classic 32-bit-word formulation):
    one lookup per state byte folds SubBytes+ShiftRows+MixColumns."""
    te = [[0] * 256 for _ in range(4)]
    td = [[0] * 256 for _ in range(4)]
    for x in range(256):
        s = _SBOX[x]
        g2, g3 = _GMUL(s, 2), _GMUL(s, 3)
        cols = (
            (g2 << 24) | (s << 16) | (s << 8) | g3,
            (g3 << 24) | (g2 << 16) | (s << 8) | s,
            (s << 24) | (g3 << 16) | (g2 << 8) | s,
            (s << 24) | (s << 16) | (g3 << 8) | g2,
        )
        for k in range(4):
            te[k][x] = cols[k]
        i = _INV_SBOX[x]
        e, n9, d, b = _GMUL(i, 14), _GMUL(i, 9), _GMUL(i, 13), _GMUL(i, 11)
        icols = (
            (e << 24) | (n9 << 16) | (d << 8) | b,
            (b << 24) | (e << 16) | (n9 << 8) | d,
            (d << 24) | (b << 16) | (e << 8) | n9,
            (n9 << 24) | (d << 16) | (b << 8) | e,
        )
        for k in range(4):
            td[k][x] = icols[k]
    return te, td


(_TE0, _TE1, _TE2, _TE3), (_TD0, _TD1, _TD2, _TD3) = _round_tables()


def _imc_word(w: int) -> int:
    a0, a1, a2, a3 = w >> 24, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF
    return (
        (_GMUL(a0, 14) ^ _GMUL(a1, 11) ^ _GMUL(a2, 13) ^ _GMUL(a3, 9)) << 24
        | (_GMUL(a0, 9) ^ _GMUL(a1, 14) ^ _GMUL(a2, 11) ^ _GMUL(a3, 13)) << 16
        | (_GMUL(a0, 13) ^ _GMUL(a1, 9) ^ _GMUL(a2, 14) ^ _GMUL(a3, 11)) << 8
        | (_GMUL(a0, 11) ^ _GMUL(a1, 13) ^ _GMUL(a2, 9) ^ _GMUL(a3, 14))
    )


class AES:
    """AES-128/192/256 over big-endian 32-bit column words."""

    def __init__(self, key: bytes):
        nk = len(key) // 4
        if nk not in (4, 6, 8) or len(key) % 4:
            raise PdfError("bad AES key size")
        self.nr = nr = nk + 6
        w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
        for i in range(nk, 4 * (nr + 1)):
            t = w[i - 1]
            if i % nk == 0:
                t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
                t = (
                    (_SBOX[t >> 24] << 24)
                    | (_SBOX[(t >> 16) & 0xFF] << 16)
                    | (_SBOX[(t >> 8) & 0xFF] << 8)
                    | _SBOX[t & 0xFF]
                )
                t ^= _RCON[i // nk - 1] << 24
            elif nk > 6 and i % nk == 4:
                t = (
                    (_SBOX[t >> 24] << 24)
                    | (_SBOX[(t >> 16) & 0xFF] << 16)
                    | (_SBOX[(t >> 8) & 0xFF] << 8)
                    | _SBOX[t & 0xFF]
                )
            w.append(w[i - nk] ^ t)
        self.ke = [w[4 * r : 4 * r + 4] for r in range(nr + 1)]
        # equivalent-inverse-cipher round keys
        kd = [list(self.ke[nr])]
        for r in range(1, nr):
            kd.append([_imc_word(x) for x in self.ke[nr - r]])
        kd.append(list(self.ke[0]))
        self.kd = kd

    def encrypt_block(self, block: bytes) -> bytes:
        rk = self.ke[0]
        s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
        s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
        s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
        s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
        T0, T1, T2, T3 = _TE0, _TE1, _TE2, _TE3
        for r in range(1, self.nr):
            rk = self.ke[r]
            t0 = T0[s0 >> 24] ^ T1[(s1 >> 16) & 255] ^ T2[(s2 >> 8) & 255] ^ T3[s3 & 255] ^ rk[0]
            t1 = T0[s1 >> 24] ^ T1[(s2 >> 16) & 255] ^ T2[(s3 >> 8) & 255] ^ T3[s0 & 255] ^ rk[1]
            t2 = T0[s2 >> 24] ^ T1[(s3 >> 16) & 255] ^ T2[(s0 >> 8) & 255] ^ T3[s1 & 255] ^ rk[2]
            t3 = T0[s3 >> 24] ^ T1[(s0 >> 16) & 255] ^ T2[(s1 >> 8) & 255] ^ T3[s2 & 255] ^ rk[3]
            s0, s1, s2, s3 = t0, t1, t2, t3
        rk = self.ke[self.nr]
        S = _SBOX
        o = bytearray(16)
        for c, (a, b, cc, d) in enumerate(
            ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
        ):
            w = (
                (S[a >> 24] << 24)
                | (S[(b >> 16) & 255] << 16)
                | (S[(cc >> 8) & 255] << 8)
                | S[d & 255]
            ) ^ rk[c]
            o[4 * c : 4 * c + 4] = w.to_bytes(4, "big")
        return bytes(o)

    def decrypt_block(self, block: bytes) -> bytes:
        rk = self.kd[0]
        s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
        s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
        s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
        s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
        T0, T1, T2, T3 = _TD0, _TD1, _TD2, _TD3
        for r in range(1, self.nr):
            rk = self.kd[r]
            t0 = T0[s0 >> 24] ^ T1[(s3 >> 16) & 255] ^ T2[(s2 >> 8) & 255] ^ T3[s1 & 255] ^ rk[0]
            t1 = T0[s1 >> 24] ^ T1[(s0 >> 16) & 255] ^ T2[(s3 >> 8) & 255] ^ T3[s2 & 255] ^ rk[1]
            t2 = T0[s2 >> 24] ^ T1[(s1 >> 16) & 255] ^ T2[(s0 >> 8) & 255] ^ T3[s3 & 255] ^ rk[2]
            t3 = T0[s3 >> 24] ^ T1[(s2 >> 16) & 255] ^ T2[(s1 >> 8) & 255] ^ T3[s0 & 255] ^ rk[3]
            s0, s1, s2, s3 = t0, t1, t2, t3
        rk = self.kd[self.nr]
        S = _INV_SBOX
        o = bytearray(16)
        for c, (a, b, cc, d) in enumerate(
            ((s0, s3, s2, s1), (s1, s0, s3, s2), (s2, s1, s0, s3), (s3, s2, s1, s0))
        ):
            w = (
                (S[a >> 24] << 24)
                | (S[(b >> 16) & 255] << 16)
                | (S[(cc >> 8) & 255] << 8)
                | S[d & 255]
            ) ^ rk[c]
            o[4 * c : 4 * c + 4] = w.to_bytes(4, "big")
        return bytes(o)


@lru_cache(maxsize=64)
def _aes(key: bytes) -> "AES":
    """Key-schedule cache — per-object keys repeat across a document."""
    return AES(key)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        data = data + bytes(16 - len(data) % 16)
    aes = _aes(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes.encrypt_block(block)
        out.extend(prev)
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]
    aes = _aes(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out.extend(a ^ b for a, b in zip(aes.decrypt_block(blk), prev))
        prev = blk
    if pad and out:
        n = out[-1]
        if 1 <= n <= 16:
            del out[-n:]
    return bytes(out)


# --------------------------------------------------------------------- #
# Standard security handler

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_pwd(pwd: bytes) -> bytes:
    return (pwd + _PAD)[:32]


def _r23_file_key(
    pwd: bytes, o: bytes, p: int, id0: bytes, r: int, length: int,
    encrypt_metadata: bool = True,
) -> bytes:
    h = hashlib.md5()
    h.update(_pad_pwd(pwd))
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:length]).digest()
    return key[:length]


def _r23_owner_key(pwd: bytes, r: int, length: int) -> bytes:
    """Algorithm 3 step (a)-(d): the RC4 key derived from the OWNER
    password (used both to build /O and, in Algorithm 7, to recover
    the padded user password from it)."""
    h = hashlib.md5(_pad_pwd(pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    return h[:length]


def _r23_user_check(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U value for this file key."""
    if r == 2:
        return rc4(key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u


@lru_cache(maxsize=64)
def _r6_hash(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (ISO 32000-2): iterated SHA-2 + AES-128-CBC.

    Deliberately expensive (~1 s in pure Python — the algorithm is a
    password-stretching KDF); cached because fixture files share their
    salts and a real file pays it once per open."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


class StdSecurity:
    """Decryption side of the standard handler.

    ``password`` (default empty) is tried first as the USER password
    (Algorithm 4/5 for R2-R4, Algorithm 2.A /U validation for R6),
    then as the OWNER password (Algorithm 7: recover the padded user
    password from /O; R6: /O validation salt + /OE unwrap).  Raises
    ``PdfError`` when neither matches."""

    def __init__(self, enc: Dict[str, Any], id0: bytes, password: bytes = b""):
        if str(enc.get("Filter", "Standard")) != "Standard":
            raise PdfError("unsupported security handler")
        self.v = int(enc.get("V", 0))
        self.r = int(enc.get("R", 2))
        o = enc.get("O") or b""
        u = enc.get("U") or b""
        p = int(enc.get("P", -1))
        length = int(enc.get("Length", 40)) // 8
        self.stm_cfm = self.str_cfm = "V2" if self.v <= 2 else None
        if self.v in (4, 5):
            cfs = enc.get("CF") or {}
            stmf = str(enc.get("StmF", "Identity"))
            strf = str(enc.get("StrF", "Identity"))

            def cfm(name: str) -> str:
                if name == "Identity":
                    return "Identity"
                cf = cfs.get(name) or {}
                return str(cf.get("CFM", "None"))

            self.stm_cfm = cfm(stmf)
            self.str_cfm = cfm(strf)
        pwd = password[:127]  # R6 truncates at 127 bytes (Alg 2.A)
        if self.r == 6 or self.v == 5:
            # AES-256 (Algorithm 2.A): /U = hash(32)+vsalt(8)+ksalt(8),
            # /O the same layout with /U[:48] mixed in as udata.
            if len(u) < 48:
                raise PdfError("bad /U for R6")
            vsalt, ksalt = u[32:40], u[40:48]
            ue = enc.get("UE") or b""
            oe = enc.get("OE") or b""
            if _r6_hash(pwd, vsalt) == u[:32]:
                ikey = _r6_hash(pwd, ksalt)
                wrapped = ue
            elif (
                len(o) >= 48
                and _r6_hash(pwd, o[32:40], u[:48]) == o[:32]
            ):
                ikey = _r6_hash(pwd, o[40:48], u[:48])
                wrapped = oe
            else:
                raise PdfError("user password required")
            self.key = aes_cbc_decrypt(ikey, b"\x00" * 16, wrapped, pad=False)[:32]
            self.stm_cfm = self.stm_cfm or "AESV3"
            self.str_cfm = self.str_cfm or "AESV3"
        else:
            klen = length if self.v >= 2 else 5
            em = bool(enc.get("EncryptMetadata", True))
            key = _r23_file_key(password, o, p, id0, self.r, klen, em)
            if _r23_user_check(key, id0, self.r)[:16] != u[:16]:
                # Algorithm 7: treat ``password`` as the owner password —
                # recover the padded user password from /O, re-derive.
                okey = _r23_owner_key(password, self.r, klen)
                upad = o[:32]
                if self.r == 2:
                    upad = rc4(okey, upad)
                else:
                    for i in range(19, -1, -1):
                        upad = rc4(bytes(b ^ i for b in okey), upad)
                key = _r23_file_key(upad, o, p, id0, self.r, klen, em)
                if _r23_user_check(key, id0, self.r)[:16] != u[:16]:
                    raise PdfError("user password required")
            self.key = key

    def _obj_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.r == 6 or self.v == 5:
            return self.key  # AES-256 uses the file key directly
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<i", num)[:3])
        h.update(struct.pack("<i", gen)[:2])
        if aes:
            h.update(b"\x73\x41\x6c\x54")  # "sAlT"
        return h.digest()[: min(len(self.key) + 5, 16)]

    def _apply(self, data: bytes, num: int, gen: int, cfm: str, enc: bool) -> bytes:
        if cfm == "Identity":
            return data
        if cfm in ("AESV2", "AESV3"):
            key = self._obj_key(num, gen, aes=True)
            if enc:
                iv = hashlib.md5(b"iv%d.%d" % (num, gen)).digest()
                return iv + aes_cbc_encrypt(key, iv, data)
            if len(data) < 16:
                return b""
            return aes_cbc_decrypt(key, data[:16], data[16:])
        return rc4(self._obj_key(num, gen, aes=False), data)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.stm_cfm or "V2", enc=False)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.str_cfm or "V2", enc=False)

    def encrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.stm_cfm or "V2", enc=True)

    def encrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.str_cfm or "V2", enc=True)


# --------------------------------------------------------------------- #
# Writer-side /Encrypt dictionary construction (empty user password)


def make_encrypt_rc4(
    id0: bytes, owner_pwd: bytes = b"owner", length_bits: int = 128,
    user_pwd: bytes = b"",
) -> Tuple[Dict[str, Any], "StdSecurity"]:
    """V2/R3 RC4 /Encrypt dict + a ready handler (Algorithms 2, 3, 5)."""
    length = length_bits // 8
    p = -44
    # Algorithm 3: /O = RC4 chain over the PADDED USER password,
    # keyed from the owner password
    okey = _r23_owner_key(owner_pwd, 3, length)
    o = rc4(okey, _pad_pwd(user_pwd))
    for i in range(1, 20):
        o = rc4(bytes(b ^ i for b in okey), o)
    key = _r23_file_key(user_pwd, o, p, id0, 3, length)
    u = _r23_user_check(key, id0, 3) + b"\x00" * 16
    enc = {
        "Filter": "Standard", "V": 2, "R": 3,
        "Length": length_bits, "P": p, "O": o, "U": u[:32],
    }
    return enc, _handler_from(enc, id0, user_pwd)


def make_encrypt_aes128(
    id0: bytes, owner_pwd: bytes = b"owner", user_pwd: bytes = b""
) -> Tuple[Dict[str, Any], "StdSecurity"]:
    """V4/R4 with an AESV2 /StdCF crypt filter."""
    base, _ = make_encrypt_rc4(id0, owner_pwd, 128, user_pwd)
    enc = dict(base)
    enc.update(
        {
            "V": 4, "R": 4,
            "CF": {"StdCF": {"CFM": "AESV2", "AuthEvent": "DocOpen", "Length": 16}},
            "StmF": "StdCF", "StrF": "StdCF",
        }
    )
    # R4 reuses the R3 key derivation; /O /U stay valid
    return enc, _handler_from(enc, id0, user_pwd)


@lru_cache(maxsize=8)
def _aes256_enc_dict(
    owner_pwd: bytes, user_pwd: bytes = b""
) -> Tuple[Tuple[str, Any], ...]:
    """The /Encrypt payload for V5/R6 (Algorithms 8/9/10).  R6 key
    derivation never uses /ID, so with fixed salts the dict is
    document-independent — memoized because each _r6_hash costs ~1 s."""
    seed = b"spark-graft-pdf-demo-"
    file_key = hashlib.sha256(seed + b"key").digest()
    vsalt = hashlib.sha256(seed + b"vs").digest()[:8]
    ksalt = hashlib.sha256(seed + b"ks").digest()[:8]
    u = _r6_hash(user_pwd, vsalt) + vsalt + ksalt
    ue = aes_cbc_encrypt(
        _r6_hash(user_pwd, ksalt), b"\x00" * 16, file_key, pad=False
    )
    ovsalt = hashlib.sha256(seed + b"ovs").digest()[:8]
    oksalt = hashlib.sha256(seed + b"oks").digest()[:8]
    o = _r6_hash(owner_pwd, ovsalt, u) + ovsalt + oksalt
    oe = aes_cbc_encrypt(
        _r6_hash(owner_pwd, oksalt, u), b"\x00" * 16, file_key, pad=False
    )
    p = -44
    perms_plain = (
        struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"T" + b"adb" + b"\x00" * 4
    )
    perms = AES(file_key).encrypt_block(perms_plain[:16])
    enc = {
        "Filter": "Standard", "V": 5, "R": 6, "Length": 256, "P": p,
        "O": o, "U": u, "OE": oe, "UE": ue, "Perms": perms,
        "CF": {"StdCF": {"CFM": "AESV3", "AuthEvent": "DocOpen", "Length": 32}},
        "StmF": "StdCF", "StrF": "StdCF",
    }
    return tuple(enc.items())


def make_encrypt_aes256(
    id0: bytes, owner_pwd: bytes = b"owner", user_pwd: bytes = b""
) -> Tuple[Dict[str, Any], "StdSecurity"]:
    """V5/R6 AES-256 (deterministic salts/key — see _aes256_enc_dict)."""
    enc = dict(_aes256_enc_dict(owner_pwd, user_pwd))
    return enc, _handler_from(enc, id0, user_pwd)


def _handler_from(
    enc: Dict[str, Any], id0: bytes, password: bytes = b""
) -> StdSecurity:
    return StdSecurity(enc, id0, password)


def build_security(
    enc: Dict[str, Any], id0: bytes, password: bytes = b""
) -> Optional[StdSecurity]:
    """Parser hook: a handler, or None if this file needs a (different)
    password / uses an unsupported scheme (the document then decodes to
    nothing — fault-tolerant, never raises past here).  A non-empty
    ``password`` is tried as user then owner, with the EMPTY password
    attempted first: empty-user files are the overwhelmingly common
    case, their R6 salt hashes stay lru-cached across a corpus, and
    any credential that validates yields the same file key (the /U
    check pins the key, not the credential), so order cannot change
    the result — only the per-document KDF cost."""
    for pwd in (b"", password) if password else (b"",):
        try:
            return StdSecurity(enc, id0, pwd)
        except (PdfError, TypeError, ValueError, KeyError):
            continue
    return None
