"""The bench.py supervisor must survive the known-flaky TPU backend
(VERDICT r3 weak #1): bounded retry on backend-acquisition failures and
a GUARANTEED parseable JSON last line whatever happens to the worker.

These tests drive ``supervise()`` against fake workers (PB_BENCH_WORKER_ARGV
test hook) covering: clean success, retryable flake then success, hang
before BACKEND_READY, hang after BACKEND_READY (budget kill), and a
non-retryable worker bug.
"""

import json
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

BENCH = Path(__file__).resolve().parents[1] / 'bench.py'


def run_supervisor(tmp_path, worker_body, *, deadline='30',
                   ready_timeout='6'):
    worker = tmp_path / 'fake_worker.py'
    worker.write_text(textwrap.dedent(worker_body))
    env = {
        'PATH': '/usr/bin:/bin',
        'PB_BENCH_WORKER_ARGV': json.dumps(
            [sys.executable, '-u', str(worker)]),
        'PB_BENCH_DEADLINE_S': deadline,
        'PB_BENCH_READY_TIMEOUT_S': ready_timeout,
        'PB_BENCH_BACKOFFS_S': '0.2,0.2',   # don't sleep 5 s in a test
        # the state file lets a fake worker behave differently per attempt
        'FAKE_STATE': str(tmp_path / 'state'),
    }
    proc = subprocess.run(
        [sys.executable, str(BENCH)], env=env,
        capture_output=True, text=True, timeout=120)
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, proc.stderr
    return proc.returncode, lines, json.loads(lines[-1])


def test_success_passthrough(tmp_path):
    rc, lines, last = run_supervisor(tmp_path, '''
        import json
        print('BACKEND_READY', flush=True)
        print(json.dumps({'metric': 'xRT_session_end_to_end',
                          'value': 50.0}))
        print(json.dumps({'metric': 'xRT_chime5_multiarray_gss',
                          'value': 90.0, 'unit': 'x_realtime',
                          'vs_baseline': 4.5}))
    ''')
    assert rc == 0
    assert last['metric'] == 'xRT_chime5_multiarray_gss'
    assert last['value'] == 90.0
    # the session line passed through too
    assert any('xRT_session_end_to_end' in ln for ln in lines)


def test_retryable_flake_then_success(tmp_path):
    # attempt 1 dies with the r3 UNAVAILABLE signature; attempt 2 works
    rc, lines, last = run_supervisor(tmp_path, '''
        import json, os, sys
        state = os.environ['FAKE_STATE']
        if not os.path.exists(state):
            open(state, 'w').write('1')
            sys.stderr.write("RuntimeError: Unable to initialize backend "
                             "'axon': UNAVAILABLE: TPU backend "
                             "setup/compile error\\n")
            sys.exit(1)
        print('BACKEND_READY', flush=True)
        print(json.dumps({'metric': 'xRT_chime5_multiarray_gss',
                          'value': 88.0, 'unit': 'x_realtime'}))
    ''')
    assert rc == 0
    assert last['value'] == 88.0


@pytest.mark.slow
def test_hang_before_ready_gives_parseable_failure(tmp_path):
    rc, lines, last = run_supervisor(tmp_path, '''
        import time
        time.sleep(600)
    ''', deadline='14', ready_timeout='4')
    assert rc == 1
    assert last['metric'] == 'xRT_chime5_multiarray_gss'
    assert last['value'] is None
    assert 'acquisition timed out' in last['error']


@pytest.mark.slow
def test_hang_after_ready_killed_on_budget(tmp_path):
    rc, lines, last = run_supervisor(tmp_path, '''
        import time
        print('BACKEND_READY', flush=True)
        time.sleep(600)
    ''', deadline='8', ready_timeout='4')
    assert rc == 1
    assert last['value'] is None
    assert 'budget' in last['error']


def test_non_retryable_bug_fails_once(tmp_path):
    rc, lines, last = run_supervisor(tmp_path, '''
        raise AssertionError('genuine benchmark bug')
    ''', deadline='60', ready_timeout='5')
    assert rc == 1
    assert last['value'] is None
    # no retry storm: the worker ran exactly once (the state file trick
    # is unused; assert via attempt count in the error string)
    assert 'attempt 1' in last['error']
