"""Shorten v2 codec: roundtrips, a hand-assembled golden bitstream (so the
encoder and decoder cannot share a compensating bug), and SPHERE
integration (the reference needs the external sph2pipe build for these,
/root/reference tools/Makefile:9-11)."""

import numpy as np
import pytest

from convtasnet_tpu.data import shorten as sh
from convtasnet_tpu.data.audio_io import read_wav


def _signal(n=4000, seed=0, noise=50):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = 3000 * np.sin(t / 30) + 800 * np.sin(t / 7.3)
    return (x + rng.integers(-noise, noise + 1, n)).astype(np.int32)


@pytest.mark.parametrize("nmean", [0, 2, 4])
@pytest.mark.parametrize("bitshift", [0, 2])
def test_roundtrip_mono(nmean, bitshift):
    x = _signal() & ~((1 << bitshift) - 1)
    enc = sh.encode(x, ftype=sh.TYPE_S16HL, nmean=nmean, bitshift=bitshift)
    dec, ftype, _ = sh.decode(enc)
    assert ftype == sh.TYPE_S16HL
    np.testing.assert_array_equal(dec[:, 0], x)
    # it actually compresses
    assert len(enc) < 2 * len(x)


def test_roundtrip_stereo_and_tail_block():
    x = np.stack([_signal(seed=1), _signal(seed=2) // 3], axis=1)
    x = x[:777]  # forces a FN_BLOCKSIZE tail block
    enc = sh.encode(x, ftype=sh.TYPE_S16LH, blocksize=256, nmean=4)
    dec, ftype, _ = sh.decode(enc)
    assert ftype == sh.TYPE_S16LH
    np.testing.assert_array_equal(dec, x)


def test_roundtrip_exercises_every_predictor():
    """Constant / linear / quadratic / noisy segments force ZERO and
    DIFF0..3 blocks respectively."""
    parts = [
        np.zeros(512, np.int32),                       # FN_ZERO
        np.full(512, 1234, np.int32),                  # DIFF0/1 (const)
        (np.arange(512) * 7).astype(np.int32),         # DIFF2 (linear)
        (np.arange(512) ** 2 // 64).astype(np.int32),  # DIFF3 (quadratic)
        _signal(512, seed=3, noise=2000),              # noisy
    ]
    x = np.concatenate(parts)
    enc = sh.encode(x, blocksize=256)
    dec, _, _ = sh.decode(enc)
    np.testing.assert_array_equal(dec[:, 0], x)


def test_roundtrip_unsigned_types():
    x = (_signal() // 16 + 128).clip(0, 255).astype(np.int32)
    enc = sh.encode(x, ftype=sh.TYPE_U8)
    dec, ftype, _ = sh.decode(enc)
    np.testing.assert_array_equal(dec[:, 0], x)
    assert np.allclose(sh.samples_to_float(dec, ftype)[:, 0],
                       (x - 128.0) / 128.0)


def test_verbatim_passthrough():
    hdr = b"NIST_1A\n   1024\nsample_count -i 300\n"
    x = _signal(300)
    enc = sh.encode(x, verbatim=hdr)
    dec, _, verb = sh.decode(enc)
    assert verb == hdr
    np.testing.assert_array_equal(dec[:, 0], x)


def test_golden_bitstream_hand_assembled():
    """A tiny stream assembled bit-by-bit from the published format — the
    decoder is checked against the spec itself, independent of the encoder.

    Header: ftype=S16HL(3), nchan=1, blocksize=4, maxnlpc=0, nmean=0,
    nskip=0. One DIFF1 block, energy k=0, residuals [1, -1, 2, -2] (vs
    initial zero history -> samples [1, 0, 2, 0]), then QUIT.

    Encodings (uvar(k) = unary(v >> k) zeros, a 1, then k low bits;
    ulong = uvar(2) of the bit-width then uvar(width) of the value;
    var(k) = uvar(k+1) of the sign-folded value):
    """
    bits = "".join([
        "110111",   # ulong 3  (ftype):    nbit=2 -> "1"+"10"; val -> "1"+"11"
        "10111",    # ulong 1  (nchan):    nbit=1 -> "1"+"01"; val -> "1"+"1"
        "1111100",  # ulong 4  (blocksize) nbit=3 -> "1"+"11"; val -> "1"+"100"
        "1001",     # ulong 0  (maxnlpc)   nbit=0 -> "1"+"00"; val -> "1"
        "1001",     # ulong 0  (nmean)
        "1001",     # ulong 0  (nskip)
        "101",      # uvar(2) = 1: FN_DIFF1
        "1000",     # uvar(3) = 0: energy k=0
        "010",      # var(0) of  1: u=2 -> unary 1 ("01") + bit 0
        "11",       # var(0) of -1: u=1 -> "1" + bit 1
        "0010",     # var(0) of  2: u=4 -> "001" + bit 0
        "011",      # var(0) of -2: u=3 -> "01" + bit 1
        "0100",     # uvar(2) = 4: FN_QUIT
    ])
    bits = bits + "0" * (-len(bits) % 32)
    payload = int(bits, 2).to_bytes(len(bits) // 8, "big")
    dec, ftype, verb = sh.decode(b"ajkg2" + payload)
    assert ftype == sh.TYPE_S16HL
    assert verb == b""
    np.testing.assert_array_equal(dec[:, 0], [1, 0, 2, 0])


def test_sphere_embedded_shorten_via_read_wav(tmp_path):
    """A shorten-coded SPHERE file decodes through the normal read path —
    the role of the reference's `sph2pipe` conversion, with no external
    binary."""
    x = _signal(8000)
    payload = sh.encode(x, ftype=sh.TYPE_S16HL)
    header = (
        "NIST_1A\n   1024\n"
        "sample_count -i 8000\n"
        "sample_rate -i 8000\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 10\n"
        "sample_coding -s24 pcm,embedded-shorten-v2\n"
        "end_head\n"
    ).encode()
    p = str(tmp_path / "utt.wv1")
    with open(p, "wb") as f:
        f.write(header + b" " * (1024 - len(header)))
        f.write(payload)
    y, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_decode_rejects_bad_streams():
    with pytest.raises(ValueError, match="magic"):
        sh.decode(b"nope" + b"\x00" * 16)
    with pytest.raises(ValueError, match="version"):
        sh.decode(b"ajkg1" + b"\x00" * 16)
    with pytest.raises(ValueError, match="bitshift would lose"):
        sh.encode(np.array([1, 2, 3], np.int32), bitshift=1)


def _header_stream(ftype=sh.TYPE_S16HL, nchan=1, blocksize=4, maxnlpc=0,
                   nmean=0, nskip=0):
    """Assemble just a header (+ QUIT) with arbitrary field values — for
    validation tests the encoder refuses to produce."""
    bw = sh._BitWriter()
    for v in (ftype, nchan, blocksize, maxnlpc, nmean, nskip):
        bw.ulong(v)
    bw.uvar(sh.FN_QUIT, sh.FNSIZE)
    return b"ajkg2" + bw.getvalue()


def test_decode_rejects_corrupt_headers():
    """Garbage header fields raise the documented ValueError instead of
    IndexError/ZeroDivisionError or attempting multi-GB allocations."""
    with pytest.raises(ValueError, match="channel count"):
        sh.decode(_header_stream(nchan=0))
    with pytest.raises(ValueError, match="channel count"):
        sh.decode(_header_stream(nchan=1 << 20))
    with pytest.raises(ValueError, match="blocksize"):
        sh.decode(_header_stream(blocksize=0))
    with pytest.raises(ValueError, match="blocksize"):
        sh.decode(_header_stream(blocksize=1 << 36))
    with pytest.raises(ValueError, match="maxnlpc"):
        sh.decode(_header_stream(maxnlpc=1 << 24))
    with pytest.raises(ValueError, match="nmean"):
        sh.decode(_header_stream(nmean=1 << 30))
