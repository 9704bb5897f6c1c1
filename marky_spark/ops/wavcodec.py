"""Real RIFF/WAVE PCM codec — pure stdlib + numpy, no audio library.

The reference never decodes media (it base64s embedded bytes verbatim,
docx.go:196-198), so audio support is part of this repo's training-data
pipeline surface, not reference parity: real sample access is what
audio features / dedup / windowing key on at corpus scale. Same contract
as the image codecs (ops/pngcodec, ops/jpegcodec): hostile input raises
:class:`WavError` (poison-pill — callers isolate it into error rows),
recognized-but-unimplemented encodings raise :class:`WavUnsupportedError`
(a ``NotImplementedError`` → ``codec_unavailable`` rows), and decode
allocations are bounded before they happen.

Scope — five format families, all really decoded:

- canonical PCM (fmt tag 1), 8-bit unsigned / 16-bit signed LE;
- ITU-T G.711 A-law (tag 6) and mu-law (tag 7) — the telephony
  encodings real speech corpora arrive in — expanded to 16-bit-scale
  linear through the standard segment/mantissa formulas (bias 0x84
  mu-law, 0x55-XOR A-law; the decode tables are derived from the
  formulas, not transcribed, and pinned by anchor values + the
  all-256-codes re-encode identity in tests);
- IMA ADPCM (tag 0x11, the classic 4-bit voice-memo encoding):
  block-header predictor/step-index parse, per-nibble state machine,
  stereo word interleave, fact-chunk tail trim;
- IEEE-float (tag 3, 32/64-bit): normalized [-1, 1) scaled to the
  16-bit convention, typed rejection of non-finite samples.

Any channel count up to 8. WAVE_FORMAT_EXTENSIBLE (0xFFFE) dispatches
on the SubFormat GUID's leading u16 to the same five families;
everything else malformed is an error.

``wav_decode``'s ``bits`` return is the scale of the returned samples
(8 for PCM8; 16 for PCM16 and for the expanded G.711 / ADPCM / float
paths), so feature normalization downstream is always
full-scale-correct.
"""
from __future__ import annotations

import struct

MAX_SAMPLES = 1 << 26  # total samples (frames × channels) a decode may allocate
MAX_CHANNELS = 8
MAX_RATE = 1_000_000

WAV_SIGNATURE = b"RIFF"


class WavError(ValueError):
    """Malformed / hostile WAV input (the poison-pill contract)."""


class WavUnsupportedError(NotImplementedError):
    """Recognized WAV whose encoding this codec does not implement —
    surfaces as ``codec_unavailable``. Every registered WAV family this
    repo has met is now really decoded, so nothing raises this today;
    the class stays for production decoders that bolt on via the same
    contract (and callers already route NotImplementedError)."""


def looks_like_wav(data: bytes) -> bool:
    """Signature sniff: RIFF container carrying a WAVE form."""
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _chunks(data: bytes):
    """Walk the RIFF chunk stream yielding (id, body) — bodies are
    validated against the declared size, and the walk honors RIFF's
    16-bit word alignment (odd-sized chunks are followed by a pad byte)."""
    pos = 12
    while pos + 8 <= len(data):
        cid, csz = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + csz]
        if len(body) < csz:
            raise WavError(
                f"chunk {cid!r} declares {csz} bytes, {len(body)} present")
        yield cid, body
        pos += 8 + csz + (csz & 1)
    if pos != len(data) and pos + 8 > len(data):
        # trailing garbage shorter than a chunk header
        if len(data) - pos not in (0, 1):  # 1 = final alignment pad
            raise WavError("trailing bytes are not a RIFF chunk")


_G711_LUTS: dict[int, "object"] = {}


def _g711_lut(tag: int):
    """256-entry decode LUT for fmt tag 6 (A-law) / 7 (mu-law), built from
    the ITU-T G.711 segment formulas (16-bit linear scale)."""
    import numpy as np

    lut = _G711_LUTS.get(tag)
    if lut is None:
        if tag == 7:  # mu-law: codes are transmitted complemented
            c = np.arange(256, dtype=np.int64) ^ 0xFF
            exp = (c >> 4) & 0x07
            mant = c & 0x0F
            mag = (((mant << 3) + 0x84) << exp) - 0x84
            lut = np.where(c & 0x80, -mag, mag).astype(np.int32)
        else:  # A-law: even bits inverted; sign bit SET means positive
            a = np.arange(256, dtype=np.int64) ^ 0x55
            exp = (a >> 4) & 0x07
            mant = a & 0x0F
            mag = np.where(exp == 0, (mant << 4) + 8,
                           ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
            lut = np.where(a & 0x80, mag, -mag).astype(np.int32)
        _G711_LUTS[tag] = lut
    return lut


def linear_to_mulaw(samples):
    """16-bit-scale linear → mu-law codes (uint8 ndarray), the standard
    bias-0x84 segment encoder. Inverse of the tag-7 decode LUT on lattice
    points; nearest-segment quantizer elsewhere."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    m = np.minimum(np.abs(x), 32635) + 0x84
    exp = np.zeros_like(m)
    for e in range(1, 8):
        exp = np.where(m >= (0x100 << (e - 1)), e, exp)
    mant = (m >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def linear_to_alaw(samples):
    """16-bit-scale linear → A-law codes (uint8 ndarray)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    m = np.minimum(np.abs(x), 32767)
    exp = np.zeros_like(m)
    for e in range(1, 8):
        exp = np.where(m >= (0x100 << (e - 1)), e, exp)
    mant = np.where(exp == 0, m >> 4, (m >> (exp + 3)) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def wav_decode(data: bytes):
    """WAV bytes → ``(sample_rate, n_channels, bits, samples)`` where
    ``samples`` is an int32 ndarray of shape (n_frames, n_channels);
    8-bit PCM is recentered to signed (stored-128) so both depths share
    the signed-sample convention."""
    import numpy as np

    if not looks_like_wav(data):
        raise WavError("not a WAV (no RIFF/WAVE signature)")
    fmt = None
    fmt_body = b""
    pcm = None
    fact = None
    for cid, body in _chunks(data):
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise WavError(f"fmt chunk is {len(body)} bytes, want >= 16")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data" and pcm is None:
            pcm = body
        elif cid == b"fact" and fact is None and len(body) >= 4:
            fact = struct.unpack_from("<I", body, 0)[0]
    if fmt is None:
        raise WavError("no fmt chunk")
    if pcm is None:
        raise WavError("no data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format rides in the first two
        # bytes of the SubFormat GUID (the rest is the fixed KSDATAFORMAT
        # suffix); the container semantics are otherwise identical
        if len(fmt_body) < 40:
            raise WavError("extensible fmt chunk lacks the SubFormat GUID")
        tag = struct.unpack_from("<H", fmt_body, 24)[0]
        if tag == 0xFFFE:
            raise WavError("extensible SubFormat is itself extensible")
        if tag == 0x11:
            # In WAVEFORMATEXTENSIBLE the WORD at offset 18 is a UNION
            # (wValidBitsPerSample / wSamplesPerBlock / wReserved) and
            # wBitsPerSample must be a container size (multiple of 8),
            # so the plain-fmt ADPCM geometry below does not apply.
            # Real-world extensible IMA ADPCM is vanishingly rare;
            # reject it explicitly rather than guess at the union.
            raise WavError("extensible IMA ADPCM is unsupported")
    if tag not in (1, 3, 6, 7, 0x11):
        raise WavError(f"unknown WAV format tag {tag:#x}")
    if not (1 <= channels <= MAX_CHANNELS):
        raise WavError(f"bad channel count {channels}")
    if not (1 <= rate <= MAX_RATE):
        raise WavError(f"bad sample rate {rate}")
    if tag == 0x11:
        # IMA ADPCM: bits-per-sample is the 4-bit code width; the real
        # geometry lives in the samples_per_block extension field
        if bits != 4:
            raise WavError(f"IMA ADPCM requires 4-bit codes, fmt says {bits}")
        if len(fmt_body) < 20:
            raise WavError("ADPCM fmt chunk lacks samples_per_block")
        spb = struct.unpack_from("<H", fmt_body, 18)[0]
        if block_align < 4 * channels:
            raise WavError("ADPCM block align smaller than block headers")
        n_blocks = len(pcm) // block_align if block_align else 0
        if n_blocks == 0:
            raise WavError("empty data chunk (zero frames)")
        if n_blocks * spb * channels > MAX_SAMPLES:
            raise WavError("ADPCM stream exceeds sample cap")
        samples = _ima_decode(pcm, channels, block_align, spb)
        if fact is not None:
            if not (0 < fact <= samples.shape[0]):
                raise WavError(
                    f"fact count {fact} outside decoded {samples.shape[0]}")
            samples = samples[:fact]
        return rate, channels, 16, samples
    if tag in (6, 7):
        if bits != 8:
            raise WavError(f"G.711 requires 8-bit codes, fmt says {bits}")
    elif tag == 3:
        if bits not in (32, 64):
            raise WavError(f"IEEE-float WAV with {bits}-bit samples")
    elif bits not in (8, 16):
        raise WavError(f"unsupported PCM bit depth {bits}")
    if block_align != channels * (bits // 8):
        raise WavError(
            f"block align {block_align} != channels*bytes "
            f"{channels * (bits // 8)}")
    if len(pcm) % block_align:
        raise WavError(
            f"data chunk {len(pcm)} bytes is not a whole number of "
            f"{block_align}-byte frames")
    n_frames = len(pcm) // block_align
    if n_frames == 0:
        # technically encodable, but every downstream statistic (means,
        # normalized features) would be NaN — reject like the image codecs
        # reject zero-dimension frames
        raise WavError("empty data chunk (zero frames)")
    if n_frames * channels > MAX_SAMPLES:
        raise WavError(
            f"{n_frames}x{channels} samples exceed cap {MAX_SAMPLES}")
    if tag == 3:
        floats = np.frombuffer(pcm, dtype="<f4" if bits == 32 else "<f8")
        if not np.isfinite(floats).all():
            raise WavError("float WAV contains non-finite samples")
        # normalized [-1, 1) convention → 16-bit integer scale. Clamp in
        # the FLOAT domain first: real files legally carry slight overs,
        # and a hostile f8 of ~1e308 would overflow the scale multiply
        # (correctly clipped either way, but warning-noisy)
        floats = np.clip(floats.astype(np.float64), -2.0, 2.0)
        samples = np.clip(np.rint(floats * 32767.0),
                          -32768, 32767).astype(np.int32)
        bits = 16
    elif tag in (6, 7):
        codes = np.frombuffer(pcm, dtype=np.uint8)
        samples = _g711_lut(tag)[codes].astype(np.int32)
        bits = 16  # samples are on the expanded 16-bit linear scale
    elif bits == 8:
        samples = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    else:
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
    return rate, channels, bits, samples.reshape(n_frames, channels)


def wav_encode(samples, sample_rate: int, bits: int = 16) -> bytes:
    """int samples (ndarray shape (n_frames, n_channels) or any nested
    sequence numpy accepts) → canonical-PCM WAV bytes. The fixture
    inverse of :func:`wav_decode`; range-checked so a decode of the
    output always round-trips exactly."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2 or arr.shape[0] < 1:
        raise WavError(f"samples must be (n_frames, n_channels), got "
                       f"shape {arr.shape}")
    n_frames, channels = arr.shape
    if not (1 <= channels <= MAX_CHANNELS):
        raise WavError(f"bad channel count {channels}")
    if not (1 <= sample_rate <= MAX_RATE):
        raise WavError(f"bad sample rate {sample_rate}")
    if bits == 8:
        if arr.min() < -128 or arr.max() > 127:
            raise WavError("8-bit samples out of [-128, 127]")
        pcm = (arr + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        if arr.min() < -32768 or arr.max() > 32767:
            raise WavError("16-bit samples out of [-32768, 32767]")
        pcm = arr.astype("<i2").tobytes()
    else:
        raise WavError(f"unsupported PCM bit depth {bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)


def _ima_decode_nibble(state: list[int], nibble: int) -> int:
    """Advance one IMA ADPCM (DVI4) state step: state = [predictor,
    step_index], returns the new predicted sample (also stored back)."""
    pred, index = state
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble & 7]))
    state[0], state[1] = pred, index
    return pred


def _ima_encode_sample(state: list[int], sample: int) -> int:
    """Pick the nibble whose decode lands closest to ``sample`` and
    advance the shared state exactly as the decoder will."""
    pred, index = state
    step = _IMA_STEP_TABLE[index]
    delta = sample - pred
    nibble = 8 if delta < 0 else 0
    if delta < 0:
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    _ima_decode_nibble(state, nibble)
    return nibble


def _ima_decode(pcm: bytes, channels: int, block_align: int,
                samples_per_block: int):
    """IMA ADPCM (WAV fmt tag 0x11) payload → int32 (n_frames, channels).
    Block layout per the public MS/IMA layout: a 4-byte per-channel
    header (int16 predictor = sample 0, step index, reserved), then the
    channels' nibble words interleaved 4 bytes at a time."""
    import numpy as np

    if block_align < 4 * channels or len(pcm) % block_align:
        raise WavError("ADPCM data is not whole blocks")
    if (block_align - 4 * channels) % (4 * channels):
        # nibble data comes in 4-byte words per channel; a ragged block
        # would silently drop frames at the zip below
        raise WavError("ADPCM block data is not whole per-channel words")
    expect = 1 + 2 * (block_align - 4 * channels) // channels
    if samples_per_block != expect:
        raise WavError(
            f"ADPCM samples_per_block {samples_per_block} != {expect} "
            f"implied by block align")
    frames: list[list[int]] = []
    for base in range(0, len(pcm), block_align):
        states = []
        block: list[list[int]] = [[] for _ in range(channels)]
        for c in range(channels):
            o = base + 4 * c
            pred = struct.unpack_from("<h", pcm, o)[0]
            index = pcm[o + 2]
            if index > 88:
                raise WavError(f"ADPCM step index {index} out of range")
            if pcm[o + 3]:
                raise WavError("ADPCM header reserved byte set")
            states.append([pred, index])
            block[c].append(pred)
        data = pcm[base + 4 * channels:base + block_align]
        for word in range(0, len(data), 4 * channels):
            for c in range(channels):
                for b in data[word + 4 * c:word + 4 * c + 4]:
                    block[c].append(_ima_decode_nibble(states[c], b & 0x0F))
                    block[c].append(_ima_decode_nibble(states[c], b >> 4))
        frames.extend(zip(*block))
    return np.array(frames, dtype=np.int32)


def wav_encode_float(samples, sample_rate: int, bits: int = 32) -> bytes:
    """16-bit-scale integer samples → IEEE-float WAV (fmt tag 3, samples
    stored as value/32767 on the normalized [-1, 1) convention). The
    fixture inverse of the tag-3 decode path: float32 carries ~24 bits of
    mantissa, so every 16-bit lattice value round-trips exactly."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2 or arr.shape[0] < 1:
        raise WavError(f"samples must be (n_frames, n_channels), got "
                       f"shape {arr.shape}")
    n_frames, channels = arr.shape
    if not (1 <= channels <= MAX_CHANNELS):
        raise WavError(f"bad channel count {channels}")
    if not (1 <= sample_rate <= MAX_RATE):
        raise WavError(f"bad sample rate {sample_rate}")
    if arr.min() < -32768 or arr.max() > 32767:
        raise WavError("16-bit samples out of [-32768, 32767]")
    if bits == 32:
        pcm = (arr / 32767.0).astype("<f4").tobytes()
    elif bits == 64:
        pcm = (arr / 32767.0).astype("<f8").tobytes()
    else:
        raise WavError(f"float WAV bits must be 32 or 64, not {bits}")
    block_align = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 3, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_adpcm(samples, sample_rate: int,
                     samples_per_block: int = 505) -> bytes:
    """16-bit samples → IMA ADPCM WAV (fmt tag 0x11). Lossy (step
    quantization), but the encoder advances the DECODER's state machine,
    so decode output is exactly the encoder's internal reconstruction —
    the fixture inverse for deterministic tests. ``samples_per_block``
    must be odd (sample 0 rides in the block header)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2 or arr.shape[0] < 1:
        raise WavError(f"samples must be (n_frames, n_channels), got "
                       f"shape {arr.shape}")
    n_frames, channels = arr.shape
    if not (1 <= channels <= MAX_CHANNELS):
        raise WavError(f"bad channel count {channels}")
    if not (1 <= sample_rate <= MAX_RATE):
        raise WavError(f"bad sample rate {sample_rate}")
    if arr.min() < -32768 or arr.max() > 32767:
        raise WavError("16-bit samples out of [-32768, 32767]")
    if samples_per_block < 9 or (samples_per_block - 1) % 8:
        # sample 0 rides in the header; the rest fill whole 4-byte
        # per-channel nibble words (8 samples each)
        raise WavError("samples_per_block must be 1 + a multiple of 8")
    block_align = 4 * channels + (samples_per_block - 1) * channels // 2
    out = bytearray()
    states = [[0, 0] for _ in range(channels)]
    for base in range(0, n_frames, samples_per_block):
        block = arr[base:base + samples_per_block]
        # pad the tail block to full length by repeating the last frame —
        # tag-0x11 streams are whole blocks; callers slice by n_frames
        if block.shape[0] < samples_per_block:
            pad = np.repeat(block[-1:], samples_per_block - block.shape[0],
                            axis=0)
            block = np.concatenate([block, pad], axis=0)
        nibbles: list[list[int]] = []
        for c in range(channels):
            pred = int(block[0, c])
            states[c][0] = pred
            out += struct.pack("<hBB", pred, states[c][1], 0)
            nibbles.append([_ima_encode_sample(states[c], int(v))
                            for v in block[1:, c]])
        for word in range(0, samples_per_block - 1, 8):
            for c in range(channels):
                chunk = nibbles[c][word:word + 8]
                for k in range(0, 8, 2):
                    out += bytes([chunk[k] | (chunk[k + 1] << 4)])
    pcm = bytes(out)
    byte_rate = sample_rate * block_align * 2 // samples_per_block
    fmt = struct.pack("<HHIIHHHH", 0x11, channels, sample_rate, byte_rate,
                      block_align, 4, 2, samples_per_block)
    fact = struct.pack("<I", n_frames)  # true per-channel sample count —
    # decode trims the tail block's repeat-padding back off with it
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_g711(samples, sample_rate: int, law: str = "mulaw") -> bytes:
    """16-bit-scale linear samples (ndarray shape (n_frames, n_channels))
    → a G.711 WAV (fmt tag 7 mu-law / 6 A-law, 8-bit codes). The fixture
    inverse of the tag-6/7 decode path: for samples on the law's decoded
    lattice the round-trip is EXACT, which is what the synthetic-corpus
    oracle arithmetic relies on."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if arr.ndim != 2 or arr.shape[0] < 1:
        raise WavError(f"samples must be (n_frames, n_channels), got "
                       f"shape {arr.shape}")
    n_frames, channels = arr.shape
    if not (1 <= channels <= MAX_CHANNELS):
        raise WavError(f"bad channel count {channels}")
    if not (1 <= sample_rate <= MAX_RATE):
        raise WavError(f"bad sample rate {sample_rate}")
    if arr.min() < -32768 or arr.max() > 32767:
        raise WavError("16-bit samples out of [-32768, 32767]")
    if law == "mulaw":
        tag, codes = 7, linear_to_mulaw(arr)
    elif law == "alaw":
        tag, codes = 6, linear_to_alaw(arr)
    else:
        raise WavError(f"unknown G.711 law {law!r}")
    pcm = codes.tobytes()
    fmt = struct.pack("<HHIIHH", tag, channels, sample_rate,
                      sample_rate * channels, channels, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_resample_linear(samples, src_rate: int, dst_rate: int):
    """Real linear-interpolation resample (per channel) — the audio
    counterpart of the image codecs' nearest-neighbor resize. Returns an
    int32 ndarray of shape (round(n*dst/src), n_channels)."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    if not (1 <= src_rate <= MAX_RATE and 1 <= dst_rate <= MAX_RATE):
        raise WavError(f"bad rates {src_rate}->{dst_rate}")
    n = arr.shape[0]
    m = max(int(round(n * dst_rate / src_rate)), 1)
    if m * arr.shape[1] > MAX_SAMPLES:
        raise WavError(f"resample target {m} frames exceeds cap")
    src_t = np.arange(n, dtype=np.float64)
    dst_t = np.arange(m, dtype=np.float64) * (src_rate / dst_rate)
    out = np.empty((m, arr.shape[1]), dtype=np.int32)
    for c in range(arr.shape[1]):
        out[:, c] = np.rint(
            np.interp(dst_t, src_t, arr[:, c])).astype(np.int32)
    return out
