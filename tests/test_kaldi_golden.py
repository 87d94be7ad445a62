"""Golden-fixture round trips for the Kaldi bridge — no Kaldi install.

A fake ``KALDI_ROOT`` is materialized with stub executables that speak the
same protocol as the real tools (argv conventions including Kaldi's
``ark:cmd |`` pipe rspecifiers, stdout/stderr contracts like
``Done N utterances``): the tests exercise the bridge's command
construction, environment assembly, subprocess plumbing, count
cross-checks, sweep/skip logic, parsing, and result pickling end-to-end
against hand-computed golden values.  ``compute-wer`` is a real
edit-distance implementation, not a canned answer.

Reference surfaces: pb_chime5/kaldi/alignment.py:12-128,
pb_chime5/kaldi/decode.py:102-169.
"""

import gzip
import os
import pickle
import stat
import textwrap

import numpy as np
import pytest

from pb_chime5_tpu.kaldi.alignment import (
    import_alignment_data, import_pdf_alignment_from_file,
    import_phone_alignment_from_file)
from pb_chime5_tpu.kaldi.decode import compute_scores, parse_wer_file


def _write_exe(path, body):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(body)
    path.chmod(path.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP)


_READ_RSPEC = '''
def read_rspecifier(src):
    import subprocess
    assert src.startswith('ark:'), src
    inner = src[4:]
    if inner.rstrip().endswith('|'):
        return subprocess.run(inner.rstrip()[:-1], shell=True, text=True,
                              capture_output=True, check=True).stdout
    return open(inner).read()
'''


@pytest.fixture
def kaldi_root(tmp_path, monkeypatch):
    root = tmp_path / 'kaldi'
    (root / 'egs/wsj/s5/utils').mkdir(parents=True)
    (root / 'tools/openfst/lib').mkdir(parents=True)

    _write_exe(root / 'src/bin/ali-to-phones', textwrap.dedent(f'''\
        #!/usr/bin/env python3
        import sys
        {textwrap.indent(_READ_RSPEC, "        ").strip()}
        args = sys.argv[1:]
        per_frame = '--per-frame' in args
        args = [a for a in args if not a.startswith('--')]
        model, src, out = args
        assert out == 'ark,t:-', out
        open(model)   # the model file must exist, like the real tool
        n = 0
        for line in read_rspecifier(src).splitlines():
            parts = line.split()
            if not parts:
                continue
            ids = [int(x) for x in parts[1:]]
            phones = [(i - 1) // 6 + 1 for i in ids]
            if not per_frame:
                phones = [p for j, p in enumerate(phones)
                          if j == 0 or p != phones[j - 1]]
            print(parts[0], *phones)
            n += 1
        print(f'LOG (ali-to-phones) Done {{n}} utterances.',
              file=sys.stderr)
    '''))
    _write_exe(root / 'src/bin/ali-to-pdf', textwrap.dedent(f'''\
        #!/usr/bin/env python3
        import sys
        {textwrap.indent(_READ_RSPEC, "        ").strip()}
        model, src, out = sys.argv[1:]
        assert out == 'ark,t:-', out
        open(model)
        n = 0
        for line in read_rspecifier(src).splitlines():
            parts = line.split()
            if not parts:
                continue
            print(parts[0], *[(int(x) - 1) // 3 for x in parts[1:]])
            n += 1
        print(f'LOG (ali-to-pdf) Converted {{n}} alignments.',
              file=sys.stderr)
    '''))

    # decode sweep tools.  Lattice text format (one utt per .lat file):
    #   utt <ac word-ids> | <lm word-ids>
    # lattice-best-path picks the acoustic arm for inv-acoustic-scale <=
    # 10 and the LM arm above — enough structure for the sweep to have a
    # real optimum.
    _write_exe(root / 'src/latbin/lattice-scale', textwrap.dedent(f'''\
        #!/usr/bin/env python3
        import sys
        {textwrap.indent(_READ_RSPEC, "        ").strip()}
        scale = [a for a in sys.argv[1:]
                 if a.startswith('--inv-acoustic-scale=')][0]
        lmwt = int(scale.split('=')[1])
        srcs = [a for a in sys.argv[1:] if a.startswith('ark:')]
        for line in read_rspecifier(srcs[0]).splitlines():
            if line.strip():
                print(lmwt, line)
    '''))
    _write_exe(root / 'src/latbin/lattice-add-penalty', textwrap.dedent('''\
        #!/usr/bin/env python3
        import sys
        sys.stdout.write(sys.stdin.read())
    '''))
    _write_exe(root / 'src/latbin/lattice-best-path', textwrap.dedent('''\
        #!/usr/bin/env python3
        import sys
        out = [a for a in sys.argv[1:] if a.startswith('ark,t:')][0][6:]
        with open(out, 'w') as fd:
            for line in sys.stdin.read().splitlines():
                parts = line.split()
                if not parts:
                    continue
                lmwt, utt = int(parts[0]), parts[1]
                rest = ' '.join(parts[2:])
                ac, lm = [arm.split() for arm in rest.split('|')]
                print(utt, *(ac if lmwt <= 10 else lm), file=fd)
        print('LOG lattice-best-path done.', file=sys.stderr)
    '''))
    _write_exe(root / 'egs/wsj/s5/utils/int2sym.pl', textwrap.dedent('''\
        #!/usr/bin/env python3
        import sys
        assert sys.argv[1] == '-f' and sys.argv[2] == '2-', sys.argv
        sym = {}
        for line in open(sys.argv[3]):
            word, idx = line.split()
            sym[idx] = word
        for line in sys.stdin:
            parts = line.split()
            if parts:
                print(parts[0], *[sym[i] for i in parts[1:]])
    '''))
    _write_exe(root / 'src/bin/compute-wer', textwrap.dedent('''\
        #!/usr/bin/env python3
        import sys
        args = [a for a in sys.argv[1:] if not a.startswith('--')
                and a != '--text']
        ref_spec = [a for a in sys.argv[1:] if a.startswith('ark:')][0]
        ref = {}
        for line in open(ref_spec[4:]):
            parts = line.split()
            if parts:
                ref[parts[0]] = parts[1:]
        ins = dl = sub = words = 0
        for line in sys.stdin:
            parts = line.split()
            if not parts:
                continue
            r, h = ref.get(parts[0], []), parts[1:]
            words += len(r)
            # Levenshtein with op counts
            import functools
            prev = [(j, j, 0, 0) for j in range(len(h) + 1)]  # cost,i,d,s
            for i in range(1, len(r) + 1):
                cur = [(i, 0, i, 0)]
                for j in range(1, len(h) + 1):
                    cands = [
                        (prev[j][0] + 1, prev[j][1], prev[j][2] + 1,
                         prev[j][3]),                       # deletion
                        (cur[j - 1][0] + 1, cur[j - 1][1] + 1,
                         cur[j - 1][2], cur[j - 1][3]),     # insertion
                        (prev[j - 1][0] + (r[i - 1] != h[j - 1]),
                         prev[j - 1][1], prev[j - 1][2],
                         prev[j - 1][3] + (r[i - 1] != h[j - 1])),
                    ]
                    cur.append(min(cands))
                prev = cur
            c, i_, d_, s_ = prev[len(h)]
            ins += i_; dl += d_; sub += s_
        errors = ins + dl + sub
        wer = 100.0 * errors / max(words, 1)
        print(f'%WER {wer:.2f} [ {errors} / {words}, {ins} ins, '
              f'{dl} del, {sub} sub ]')
    '''))

    monkeypatch.setenv('KALDI_ROOT', str(root))
    return root


@pytest.mark.slow
def test_import_alignment_data_golden(kaldi_root, tmp_path):
    ali_dir = tmp_path / 'ali'
    ali_dir.mkdir()
    with gzip.open(ali_dir / 'ali.1.gz', 'wt') as fd:
        fd.write('utt1 1 2 7 8 13\n')
    with gzip.open(ali_dir / 'ali.2.gz', 'wt') as fd:
        fd.write('utt2 1 1 2\n')
    (ali_dir / 'final.alimdl').write_text('fake model\n')

    pdf = import_alignment_data(ali_dir)
    np.testing.assert_array_equal(pdf['utt1'], [0, 0, 2, 2, 4])
    np.testing.assert_array_equal(pdf['utt2'], [0, 0, 0])

    phones = import_alignment_data(
        ali_dir, import_fn=import_phone_alignment_from_file,
        per_frame=True)
    np.testing.assert_array_equal(phones['utt1'], [1, 1, 2, 2, 3])
    np.testing.assert_array_equal(phones['utt2'], [1, 1, 1])

    seq = import_alignment_data(
        ali_dir, import_fn=import_phone_alignment_from_file,
        per_frame=False)
    np.testing.assert_array_equal(seq['utt1'], [1, 2, 3])
    np.testing.assert_array_equal(seq['utt2'], [1])


def test_import_alignment_count_mismatch_raises(kaldi_root, tmp_path,
                                                monkeypatch):
    # tamper with the stub so it reports one utterance too many: the
    # bridge must notice (its stderr count cross-check)
    tool = kaldi_root / 'src/bin/ali-to-pdf'
    tool.write_text(tool.read_text().replace('{n} alignments',
                                             '{n + 1} alignments'))
    ali_dir = tmp_path / 'ali'
    ali_dir.mkdir()
    with gzip.open(ali_dir / 'ali.1.gz', 'wt') as fd:
        fd.write('utt1 1 2\n')
    (ali_dir / 'final.alimdl').write_text('fake model\n')
    with pytest.raises(AssertionError):
        import_alignment_data(ali_dir)


@pytest.mark.slow
def test_compute_scores_golden(kaldi_root, tmp_path):
    decode_dir = tmp_path / 'decode'
    hclg_dir = tmp_path / 'hclg'
    (decode_dir / 'lats').mkdir(parents=True)
    hclg_dir.mkdir()
    (hclg_dir / 'words.txt').write_text(
        'a 1\nb 2\nc 3\nd 4\ne 5\nf 6\ng 7\n<UNK> 8\n')
    ref_text = tmp_path / 'ref.txt'
    ref_text.write_text('utt1 a b c d\nutt2 e f\n')
    # acoustic arm: utt1 perfect, utt2 one sub  -> 1/6 errors
    # LM arm: utt1 one sub + one del, utt2 perfect -> 2/6 errors
    (decode_dir / 'lats' / 'utt1.lat').write_text('utt1 1 2 3 4 | 1 2 7\n')
    (decode_dir / 'lats' / 'utt2.lat').write_text('utt2 5 7 | 5 6\n')

    result = compute_scores(decode_dir, hclg_dir, ref_text,
                            min_lmwt=8, max_lmwt=12,
                            ignore_return_codes=False)

    assert result['lmwt'] == [8, 9, 10, 11, 12]
    np.testing.assert_allclose(result['wer'],
                               [16.67, 16.67, 16.67, 33.33, 33.33])
    assert result['errors'] == [1, 1, 1, 2, 2]
    assert result['ins'] == [0, 0, 0, 0, 0]
    assert result['del'] == [0, 0, 0, 1, 1]
    assert result['sub'] == [1, 1, 1, 1, 1]
    assert result['words'] == [6] * 5

    # result.pkl persisted (DataFrame when pandas is available)
    with open(decode_dir / 'result.pkl', 'rb') as fd:
        pickled = pickle.load(fd)
    assert len(pickled['wer']) == 5

    # single wer file parses on its own
    assert parse_wer_file(decode_dir / 'wer_8')[0] == 16.67

    # re-run: tra files complete -> no rescale commands, same result
    result2 = compute_scores(decode_dir, hclg_dir, ref_text,
                             min_lmwt=8, max_lmwt=12,
                             ignore_return_codes=False)
    assert result2['wer'] == result['wer']
