"""The sacred-compatible experiment engine."""

import json

import pytest

from pb_chime5_tpu.scripts.experiment import Experiment, _parse_value


def test_parse_value():
    assert _parse_value('5') == 5
    assert _parse_value('True') is True
    assert _parse_value('None') is None
    assert _parse_value('(1, 2)') == (1, 2)
    assert _parse_value('dev') == 'dev'
    assert _parse_value('cache/chime5.json') == 'cache/chime5.json'


def _exp(tmp_path):
    exp = Experiment('test', default_storage_dir=tmp_path / 'runs')
    exp.add_config({'a': 1, 'b': 'x', 'session_id': 'dev'})
    exp.named_config('preset', {'a': 99})
    return exp


def test_parse_argv_overrides(tmp_path):
    exp = _exp(tmp_path)
    command, storage = exp.parse_argv(['with', 'a=5', 'b=hello'])
    assert command == 'main'
    assert exp.config['a'] == 5
    assert exp.config['b'] == 'hello'


def test_parse_argv_command_and_named_config(tmp_path):
    exp = _exp(tmp_path)
    command, _ = exp.parse_argv(['test_run', 'with', 'preset', 'b=2'])
    assert command == 'test_run'
    assert exp.config['a'] == 99
    assert exp.config['b'] == 2


def test_parse_argv_file_storage(tmp_path):
    exp = _exp(tmp_path)
    _, storage = exp.parse_argv(['-F', str(tmp_path / 'other'), 'with',
                                 'a=2'])
    assert storage == tmp_path / 'other'


def test_config_from_signature(tmp_path):
    def factory(x=1, y='z', *, flag=True, no_default):
        pass
    exp = Experiment('t', default_storage_dir=tmp_path)
    exp.add_config_from_signature(factory)
    assert exp.config == {'x': 1, 'y': 'z', 'flag': True}


def test_run_dir_lifecycle(tmp_path):
    exp = _exp(tmp_path)
    calls = []
    exp._commands['main'] = lambda e: calls.append(e.run_dir)
    exp.run_commandline(['with', 'a=3'])
    assert calls and calls[0].name == '1'
    cfg = json.loads((calls[0] / 'config.json').read_text())
    assert cfg['a'] == 3
    meta = json.loads((calls[0] / 'run.json').read_text())
    assert meta['status'] == 'COMPLETED'
    # second run auto-increments
    exp2 = _exp(tmp_path)
    exp2._commands['main'] = lambda e: calls.append(e.run_dir)
    exp2.run_commandline([])
    assert calls[1].name == '2'


def test_failed_run_status(tmp_path):
    exp = _exp(tmp_path)

    def boom(e):
        raise RuntimeError('x')
    exp._commands['main'] = boom
    with pytest.raises(RuntimeError):
        exp.run_commandline([])
    meta = json.loads((exp.run_dir / 'run.json').read_text())
    assert meta['status'] == 'FAILED'


def test_unknown_command(tmp_path):
    exp = _exp(tmp_path)
    with pytest.raises(SystemExit):
        exp.run_commandline(['nope'])
