"""Fuzz / property tests for the native C++ audio decoders
(voicebox_tpu/native/flacio.cpp, wavio.cpp).

Two properties beyond the directed cases in test_native.py:

1. **Randomized combined-config round-trips** — the directed tests cover one
   bitstream feature at a time; here random combinations (subframe mode x
   channel mode x bit depth x block size x partitions x Rice method x escapes
   x declared/undeclared length) are encoded with the independent Python
   reference encoder (tests/flac_ref_encoder.py) and must decode bit-exactly.
   Interaction bugs (e.g. side-channel bps+1 meeting raw-bits escapes) only
   surface on combinations.

2. **Corruption never crashes the process** — the decoder is a from-scratch
   C++ bitstream parser reached via ctypes: an out-of-bounds read/write or an
   uncaught allocation failure would segfault/abort the *host* process (the
   data-loader worker). Byte flips and truncations of valid streams are
   decoded in a SUBPROCESS; the property is that the subprocess exits cleanly
   — every corrupt input must come back as a normal decode, a shorter decode,
   or None, never a crash. Includes directed corrupt-STREAMINFO cases (huge
   declared total) that used to be able to abort via std::bad_alloc.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from voicebox_tpu import native

pytestmark = pytest.mark.skipif(
    not native.flac_available(), reason="no native toolchain"
)


def _random_signal(rs, n, bps, kind):
    lim = 2 ** (bps - 1) - 1
    if kind == "constant":
        return np.full(n, rs.randint(-lim - 1, lim + 1), dtype=np.int64)
    if kind == "noise":
        # small noise keeps Rice quotients bounded for the encoder;
        # amplitude must also fit the bit depth (8-bit: lim = 127)
        a = min(200, lim)
        return rs.randint(-a, a + 1, size=n).astype(np.int64)
    if kind == "sine":
        amp = min(lim // 2, 3000)
        t = np.arange(n)
        x = amp * np.sin(t / rs.uniform(5.0, 40.0))
        x = x + rs.randint(-30, 31, size=n)
        return np.clip(np.round(x), -lim - 1, lim).astype(np.int64)
    if kind == "ramp":
        x = np.linspace(-min(lim, 4000), min(lim, 4000), n)
        return np.round(x).astype(np.int64)
    raise ValueError(kind)


def _random_config(rs):
    """One random encoder configuration honouring the reference encoder's
    structural constraints (partition divisibility, first-partition order)."""
    bps = int(rs.choice([8, 12, 16, 20, 24]))
    mode = str(rs.choice(
        ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
         "fixed4", "lpc"]
    ))
    kind = "constant" if mode == "constant" else str(
        rs.choice(["noise", "sine", "ramp"])
    )
    nch = int(rs.choice([1, 2]))
    channel_mode = "independent"
    if nch == 2:
        channel_mode = str(rs.choice(
            ["independent", "left_side", "right_side", "mid_side"]
        ))
    block_size = int(rs.choice([192, 256, 512, 1024, 2048, 4096]))
    n = block_size * int(rs.randint(1, 4)) + int(rs.randint(0, block_size))
    n = max(n, 16)

    kw = dict(mode=mode, channel_mode=channel_mode, block_size=block_size,
              declare_total=bool(rs.randint(0, 2)),
              ss_from_streaminfo=bool(rs.randint(0, 2)),
              rice_method=int(rs.randint(0, 2)))
    pred_order = {"constant": 0, "verbatim": 0, "lpc": 2}.get(
        mode, int(mode[-1]) if mode.startswith("fixed") else 0
    )
    if mode == "lpc":
        # a gentle stable-ish second-order predictor
        a = rs.uniform(0.5, 1.5)
        b = rs.uniform(-0.7, 0.0)
        kw["lpc_coefs"] = [int(round(a * 1024)), int(round(b * 1024))]
        kw["lpc_shift"] = 10
        kw["lpc_precision"] = 12
    if mode not in ("constant", "verbatim"):
        # partition order: psize must divide block_size and leave the first
        # partition at least pred_order samples
        choices = [0]
        for po in (1, 2, 3):
            psize = block_size >> po
            if block_size % (1 << po) == 0 and psize >= max(pred_order, 1):
                choices.append(po)
        po = int(rs.choice(choices))
        kw["partition_order"] = po
        if po:
            # the reference encoder applies one partition order to every
            # frame, including a partial tail — keep n a frame multiple
            n = block_size * max(1, n // block_size)
        if rs.randint(0, 2):
            kw["escape_partitions"] = tuple(
                p for p in range(1 << po) if rs.randint(0, 2)
            )
    return n, nch, bps, kind, kw


def test_random_roundtrip_sweep(tmp_path):
    """40 random encoder configurations all round-trip bit-exactly."""
    from flac_ref_encoder import write_flac

    rs = np.random.RandomState(1234)
    for trial in range(40):
        n, nch, bps, kind, kw = _random_config(rs)
        channels = np.stack(
            [_random_signal(rs, n, bps, kind) for _ in range(nch)]
        )
        if kw["mode"] == "constant" and nch == 2:
            # constant mode requires each SUBFRAME constant; side channels
            # are differences of constants — still constant, fine
            pass
        p = tmp_path / f"fuzz{trial}.flac"
        sr = int(rs.choice([16000, 22050, 24000, 44100]))
        write_flac(p, channels, sr, bps=bps, **kw)
        got = native.flac_read(p)
        assert got is not None, f"trial {trial} failed to decode: {kw}"
        wave, got_sr = got
        assert got_sr == sr
        expected = (channels.astype(np.float64).mean(axis=0)
                    / (1 << (bps - 1))).astype(np.float32)
        np.testing.assert_array_equal(
            wave, expected, err_msg=f"trial {trial}: {kw}"
        )


_CORRUPTION_WORKER = r"""
import sys
import numpy as np
from voicebox_tpu import native

path, out_path, kind = sys.argv[1], sys.argv[2], sys.argv[3]
data = open(path, "rb").read()
rs = np.random.RandomState(99)
n_none = n_ok = 0

def probe(blob, tag):
    global n_none, n_ok
    p = out_path + ".probe." + kind
    with open(p, "wb") as f:
        f.write(blob)
    if kind == "flac":
        info = native.flac_info(p)  # header path must not crash either
        got = native.flac_read(p)
    else:
        info = native.wav_info(p)
        got = native.wav_read(p)
    if got is None:
        n_none += 1
    else:
        wave, sr = got
        assert wave.dtype == np.float32 and wave.ndim == 1, tag
        assert len(wave) < (1 << 31), tag
        n_ok += 1

# single-byte flips: every header byte + 160 random positions
positions = list(range(min(64, len(data))))
positions += [int(x) for x in rs.randint(0, len(data), size=160)]
for i, pos in enumerate(positions):
    blob = bytearray(data)
    blob[pos] ^= 1 << (i % 8)
    probe(bytes(blob), f"flip@{pos}")

# truncations at 40 random points (and the pathological tiny ones)
for cut in sorted({int(x) for x in rs.randint(1, len(data), size=40)}
                  | {1, 2, 3, 4, 5, 8, 21, 42}):
    probe(data[:cut], f"trunc@{cut}")

# multi-byte scrambles of random 8-byte windows
for _ in range(40):
    pos = int(rs.randint(0, max(1, len(data) - 8)))
    blob = bytearray(data)
    blob[pos:pos + 8] = bytes(rs.randint(0, 256, size=8, dtype=np.uint8))
    probe(bytes(blob), f"scramble@{pos}")

print(f"CORRUPTION_OK none={n_none} decoded={n_ok}")
"""


def test_corruption_never_crashes(tmp_path):
    from flac_ref_encoder import write_flac

    rs = np.random.RandomState(7)
    x = np.clip(
        np.round(2500 * np.sin(np.arange(6000) / 13.0))
        + rs.randint(-20, 21, size=6000),
        -32768, 32767,
    ).astype(np.int64)
    src = tmp_path / "valid.flac"
    # exercise both declared and undeclared flavours under corruption
    write_flac(src, np.stack([x, x // 2]), 24000, block_size=1024,
               mode="fixed2", channel_mode="mid_side", partition_order=1)
    src_undecl = tmp_path / "valid_undecl.flac"
    write_flac(src_undecl, x[None, :], 24000, block_size=1024,
               mode="fixed2", declare_total=False)

    worker = tmp_path / "worker.py"
    worker.write_text(_CORRUPTION_WORKER)
    for stream in (src, src_undecl):
        _run_corruption_worker(worker, stream, tmp_path, "flac")


def test_wav_corruption_never_crashes(tmp_path):
    """Same crash-safety property for the WAV decoder (wavio.cpp)."""
    from scipy.io import wavfile

    rs = np.random.RandomState(5)
    x = (rs.randn(6000) * 0.2).astype(np.float32)
    src16 = tmp_path / "valid16.wav"
    wavfile.write(src16, 24000, (x * 32767).astype(np.int16))
    srcf = tmp_path / "validf.wav"
    wavfile.write(srcf, 24000, np.stack([x, -x], axis=1))  # stereo float32

    worker = tmp_path / "worker.py"
    worker.write_text(_CORRUPTION_WORKER)
    for stream in (src16, srcf):
        _run_corruption_worker(worker, stream, tmp_path, "wav")


def _run_corruption_worker(worker, stream, tmp_path, kind):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, str(worker), str(stream),
         str(tmp_path / "out"), kind],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo", env=env,
    )
    assert proc.returncode == 0, (
        f"decoder crashed on corrupt input ({stream.name}):\n"
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )
    assert "CORRUPTION_OK" in proc.stdout


def test_corrupt_streaminfo_huge_total_declared(tmp_path):
    """A corrupt 36-bit STREAMINFO total (here ~64G samples) must fail
    cleanly: no std::bad_alloc abort in the reserve, no host MemoryError from
    the Python buffer sizing — just None."""
    from flac_ref_encoder import write_flac

    p = tmp_path / "huge.flac"
    write_flac(p, _small_sig()[None, :], 24000, block_size=512)
    data = bytearray(p.read_bytes())
    # STREAMINFO layout after 'fLaC' + 4-byte block header: 16+16+24+24 bits
    # of sizes, 20 sample rate, 3 channels, 5 bps, then the 36-bit total.
    # Bytes 8..42 hold STREAMINFO; the total's high bits live in byte 21
    # (4 low bits) and bytes 22-25. Set them all to 0xFF.
    data[21] |= 0x0F
    data[22:26] = b"\xff\xff\xff\xff"
    p.write_bytes(bytes(data))
    info = native.flac_info(p)
    assert info is not None and info[0] > (1 << 35)  # the corruption "took"
    assert native.flac_read(p) is None
    # the C entry point directly (bypassing the Python sizing ceiling): the
    # capped reserve + declared-total completeness check must yield a clean
    # -1, not a bad_alloc abort
    import ctypes

    lib = native._load_flac()
    cap = 1 << 16
    buf = np.empty(cap, dtype=np.float32)
    sr = ctypes.c_int(0)
    got = lib.vb_flac_read(
        str(p).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap, ctypes.byref(sr),
    )
    assert got == -1


def test_undeclared_cap_growth_still_exact(tmp_path):
    """The C-side decode now stops at the caller's buffer size for
    undeclared streams; the Python retry loop must still converge to the
    exact full decode (regression for the capacity handshake)."""
    from flac_ref_encoder import write_flac

    n = 70_000  # forces at least one grow cycle past the 65536 floor
    x = np.full((1, n), -7, dtype=np.int64)
    p = tmp_path / "grow.flac"
    write_flac(p, x, 24000, block_size=4096, mode="constant",
               declare_total=False)
    assert max(os.path.getsize(p) * 4, 1 << 16) < n
    wave, sr = native.flac_read(p)
    assert sr == 24000 and len(wave) == n
    np.testing.assert_array_equal(
        wave, np.full(n, -7 / (1 << 15), dtype=np.float32)
    )


def _small_sig(n=1500):
    t = np.arange(n)
    return np.round(1000 * np.sin(t / 9.0)).astype(np.int64)
