"""Audio / JSON / filesystem I/O."""

import numpy as np
import pytest

from pb_chime5_tpu.io import (
    load_audio, dump_audio, audio_length, audio_channels,
    load_json, dump_json, dumps_json, mkdir_p, symlink,
    recursive_transform,
)
from pb_chime5_tpu.io.audio import HAVE_NATIVE
from pb_chime5_tpu.io import wav as pywav


def test_dump_load_roundtrip_no_normalize(tmp_path):
    # reference doctest audiowrite.py:40-66
    a = np.array([1, 2, -4, 4], np.int16)
    f = tmp_path / 'a.wav'
    dump_audio(a, f, normalize=False)
    np.testing.assert_array_equal(
        load_audio(f, dtype=np.int16), a)
    # int16 read as float64 scales by 2^-15
    np.testing.assert_allclose(load_audio(f), a / 2 ** 15)


def test_dump_normalize_peak(tmp_path):
    # reference: peak maps to (2^15 - 1) / 2^15  (audiowrite.py:145-161)
    a = np.array([1.0, 2.0, -4.0, 4.0])
    f = tmp_path / 'a.wav'
    dump_audio(a, f, normalize=True)
    got = load_audio(f)
    peak = np.abs(got).max()
    np.testing.assert_allclose(peak, (2 ** 15 - 1) / 2 ** 15, atol=2e-5)
    np.testing.assert_allclose(got / peak, a / 4.0, atol=1e-4)


def test_segment_read(tmp_path):
    x = (np.arange(1000) % 100).astype(np.int16)
    f = tmp_path / 'x.wav'
    dump_audio(x, f, normalize=False)
    seg = load_audio(f, start=100, stop=200, dtype=np.int16)
    np.testing.assert_array_equal(seg, x[100:200])
    seg = load_audio(f, start=950, frames=100, dtype=np.int16)
    # file too short: smaller array returned (soundfile semantics)
    assert seg.shape == (50,)
    seg = load_audio(f, start=950, frames=100, dtype=np.int16, fill_value=0)
    assert seg.shape == (100,)
    np.testing.assert_array_equal(seg[50:], 0)


def test_multichannel_layout(tmp_path):
    x = np.stack([np.arange(100), np.arange(100) + 1000]).astype(np.int16)
    f = tmp_path / 'mc.wav'
    dump_audio(x, f, normalize=False)   # (channels, samples) in
    assert audio_channels(f) == 2
    assert audio_length(f) == 100
    got = load_audio(f, dtype=np.int16)
    np.testing.assert_array_equal(got, x)  # (channels, samples) out
    seg = load_audio(f, start=10, stop=20, dtype=np.int16)
    assert seg.shape == (2, 10)
    np.testing.assert_array_equal(seg, x[:, 10:20])


def test_unit_seconds(tmp_path):
    x = np.zeros(32000, np.int16)
    x[16000:16010] = 5
    f = tmp_path / 's.wav'
    dump_audio(x, f, normalize=False, sample_rate=16000)
    seg = load_audio(f, start=1, frames=1, unit='seconds', dtype=np.int16)
    assert seg.shape == (16000,)
    assert seg[0] == 5


def test_expected_sample_rate(tmp_path):
    f = tmp_path / 'r.wav'
    dump_audio(np.zeros(10, np.int16), f, normalize=False, sample_rate=8000)
    with pytest.raises(ValueError, match='sampling rate'):
        load_audio(f, expected_sample_rate=16000)


def test_incremental_write(tmp_path):
    # reference doctest audiowrite.py:61-105: write at offset, extend file
    f = tmp_path / 'inc.wav'
    dump_audio((np.arange(8) / 32).astype(np.float64), f, normalize=False,
               dtype=None)
    dump_audio(np.array([16, 24]) / 32, f, normalize=False, dtype=None,
               start=1)
    got = load_audio(f)
    np.testing.assert_allclose(got[1:3], [0.5, 0.75])
    np.testing.assert_allclose(got[0], 0.0)
    # write past the end -> zero gap + extension
    dump_audio(np.array([16, 24, 24, 24]) / 32, f, normalize=False,
               dtype=None, start=20)
    got = load_audio(f)
    assert got.shape == (24,)
    np.testing.assert_allclose(got[8:20], 0.0)
    np.testing.assert_allclose(got[20:], [0.5, 0.75, 0.75, 0.75])


def test_incremental_write_fresh_file(tmp_path):
    """start offset on a NOT-yet-existing file creates the zero gap
    instead of silently writing at 0."""
    f = tmp_path / 'fresh.wav'
    dump_audio(np.array([8, 9]) / 32, f, normalize=False, dtype=None,
               start=5)
    got = load_audio(f)
    assert got.shape == (7,)
    np.testing.assert_allclose(got[:5], 0.0)
    np.testing.assert_allclose(got[5:], [0.25, 0.28125])


def test_float32_wav(tmp_path):
    x = np.linspace(-1, 1, 100).astype(np.float32)
    f = tmp_path / 'f32.wav'
    dump_audio(x, f, normalize=False, dtype=None)
    got = load_audio(f, dtype=np.float32)
    np.testing.assert_array_equal(got, x)


def test_python_and_native_readers_agree(tmp_path):
    if not HAVE_NATIVE:
        pytest.skip('native extension not built')
    x = np.random.default_rng(0).integers(-2000, 2000, (3, 500)) \
        .astype(np.int16)
    f = tmp_path / 'agree.wav'
    dump_audio(x, f, normalize=False)
    py, sr_py = pywav.read_wav(f, 17, 230)
    from pb_chime5_tpu.io import _wav_ops
    raw, ch, bits, fmt, sr = _wav_ops.read(str(f), 17, 230)
    native = np.frombuffer(raw, np.int16).reshape(-1, ch)
    np.testing.assert_array_equal(py, native)
    assert sr == sr_py


def test_json_numpy_roundtrip(tmp_path):
    obj = {'a': np.int64(3), 'b': np.arange(3), 'c': np.float32(1.5)}
    f = tmp_path / 'x.json'
    dump_json(obj, f)
    got = load_json(f)
    assert got == {'a': 3, 'b': [0, 1, 2], 'c': 1.5}
    assert '"a": 3' in dumps_json(obj)


def test_recursive_transform():
    tree = {'x': {'u': 'a.wav', 'v': 'b.wav'}, 'y': ['c.wav']}
    starts = {'x': {'u': 1, 'v': 2}, 'y': [3]}
    out = recursive_transform(lambda p, s: f'{p}@{s}', tree, starts)
    assert out == {'x': {'u': 'a.wav@1', 'v': 'b.wav@2'}, 'y': ['c.wav@3']}


def test_mkdir_symlink(tmp_path):
    d = tmp_path / 'a' / 'b'
    mkdir_p(d)
    assert d.is_dir()
    target = tmp_path / 'target'
    target.write_text('x')
    link = tmp_path / 'link'
    symlink(target, link)
    symlink(target, link)  # idempotent
    assert link.read_text() == 'x'


def test_nist_sphere_diagnostic(tmp_path):
    """A NIST-SPHERE file with a .wav suffix raises the reference's
    improved diagnostic (audioread.py:197-207) instead of a parse error."""
    import pytest
    sph = tmp_path / 'fake.wav'
    sph.write_bytes(b'NIST_1A\n   1024\nsample_rate -i 16000\nend_head\n')
    with pytest.raises(RuntimeError, match='NIST SPHERE'):
        load_audio(sph)


def test_wrong_suffix_diagnostic(tmp_path):
    import pytest
    bad = tmp_path / 'fake.flac'
    bad.write_bytes(b'fLaC....')
    with pytest.raises(RuntimeError, match='Wrong suffix .flac'):
        load_audio(bad)


def test_legacy_audioread(tmp_path):
    """audioread: seconds offset/duration, float32, (signal, rate)."""
    from pb_chime5_tpu.io.audio import audioread
    sig = np.linspace(-0.5, 0.5, 32000).astype(np.float64)
    p = tmp_path / 'x.wav'
    dump_audio(sig, p, sample_rate=16000, normalize=False)
    out, rate = audioread(p, offset=0.5, duration=1.0)
    assert rate == 16000
    assert out.dtype == np.float32
    assert out.shape == (16000,)
    np.testing.assert_allclose(
        out, sig[8000:24000].astype(np.float32), atol=2 ** -14)
    import pytest
    with pytest.raises(ValueError, match='Requested sampling rate'):
        audioread(p, expected_sample_rate=8000)


def test_truncated_fmt_chunk_diagnostic(tmp_path):
    """A WAV cut off inside the fmt chunk must raise the ValueError the
    legacy-read diagnostics understand, not a raw struct.error."""
    import struct
    import pytest
    bad = tmp_path / 'cut.wav'
    bad.write_bytes(b'RIFF' + struct.pack('<I', 100) + b'WAVE'
                    + b'fmt ' + struct.pack('<I', 16) + b'\x01\x00')
    with pytest.raises(ValueError, match='truncated fmt chunk'):
        load_audio(bad)


def test_truncated_extensible_fmt_chunk_diagnostic(tmp_path):
    """A WAVE_FORMAT_EXTENSIBLE header whose declared fmt size (40) exceeds
    the bytes actually present must raise the truncated-fmt ValueError,
    not a raw struct.error on the sub-format read (ADVICE r2)."""
    import struct
    import pytest
    bad = tmp_path / 'cut_ext.wav'
    # declared chunk_size=40 but only 20 fmt bytes on disk
    fmt16 = struct.pack('<HHIIHH', 0xFFFE, 1, 16000, 32000, 2, 16)
    bad.write_bytes(b'RIFF' + struct.pack('<I', 100) + b'WAVE'
                    + b'fmt ' + struct.pack('<I', 40) + fmt16 + b'\x00' * 4)
    with pytest.raises(ValueError, match='truncated fmt chunk'):
        load_audio(bad)
