"""Minimal sacred-compatible experiment engine.

The reference drives its CLIs with sacred (config auto-derived from the
``get_enhancer`` signature, ``with key=value`` overrides, named configs,
FileStorageObserver run dirs — reference scripts/run.py:19-143).  sacred
is not a dependency here; this module reproduces the slice of its
behaviour the front-end scripts rely on:

* ``Experiment(name)`` with ``add_config(dict)`` /
  ``add_config_from_signature(fn)``,
* command line ``[command] [-F DIR] with key=value ...`` where values are
  parsed as Python literals (fallback: string),
* named configs registered with ``named_config``,
* auto-incrementing run dirs ``<storage>/<run_id>/`` containing
  ``config.json`` and ``run.json`` (like sacred's FileStorageObserver),
* commands registered with ``command``; default command is ``main``.
"""

import ast
import os
import datetime
import inspect
import json
import sys
from pathlib import Path

from pb_chime5_tpu.io import dump_json

__all__ = ['Experiment']


def _parse_value(text):
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


class Experiment:
    def __init__(self, name, default_storage_dir='runs'):
        self.name = name
        self.config = {}
        self._named_configs = {}
        self._commands = {}
        self.default_storage_dir = Path(default_storage_dir)
        self.run_dir = None

    # -- config ------------------------------------------------------

    def add_config(self, cfg: dict):
        self.config.update(cfg)

    def add_config_from_signature(self, fn):
        """The reference's inspect trick (run.py:19-27): every keyword of
        the factory becomes a config entry."""
        for key, param in inspect.signature(fn).parameters.items():
            if param.default is not inspect.Parameter.empty:
                self.config[key] = param.default

    def named_config(self, name, cfg: dict):
        self._named_configs[name] = cfg

    def capture_kwargs(self, fn):
        """kwargs of ``fn`` filled from the current config."""
        out = {}
        for key, param in inspect.signature(fn).parameters.items():
            if key in self.config:
                out[key] = self.config[key]
        return out

    # -- commands ----------------------------------------------------

    def command(self, fn):
        self._commands[fn.__name__] = fn
        return fn

    def main(self, fn):
        self._commands['main'] = fn
        return fn

    # -- run dir (FileStorageObserver-alike) --------------------------

    def _create_run_dir(self, storage_dir):
        storage_dir = Path(storage_dir)
        storage_dir.mkdir(parents=True, exist_ok=True)
        existing = [int(p.name) for p in storage_dir.iterdir()
                    if p.name.isdigit()]
        run_id = max(existing, default=0) + 1
        run_dir = storage_dir / str(run_id)
        run_dir.mkdir()
        printable = {
            k: (v if isinstance(v, (int, float, str, bool, list, tuple,
                                    dict, type(None))) else repr(v))
            for k, v in self.config.items()
        }
        dump_json(printable, run_dir / 'config.json')
        dump_json({
            'experiment': self.name,
            'start_time': datetime.datetime.now().isoformat(),
            'command': ' '.join(sys.argv),
            'status': 'RUNNING',
        }, run_dir / 'run.json')
        return run_dir

    def finalize_run(self, status='COMPLETED'):
        if self.run_dir is None:
            return
        try:
            import jax
            if jax.process_index() != 0:
                return
        except Exception:
            pass
        meta = json.loads((self.run_dir / 'run.json').read_text())
        meta['status'] = status
        meta['stop_time'] = datetime.datetime.now().isoformat()
        dump_json(meta, self.run_dir / 'run.json')

    # -- CLI ----------------------------------------------------------

    def parse_argv(self, argv=None):
        argv = list(sys.argv[1:] if argv is None else argv)
        command = 'main'
        storage_dir = self.default_storage_dir

        # optional -F / --file_storage
        for flag in ('-F', '--file_storage'):
            if flag in argv:
                i = argv.index(flag)
                storage_dir = Path(argv[i + 1])
                del argv[i:i + 2]

        if argv and argv[0] != 'with' and '=' not in argv[0]:
            command = argv.pop(0)

        if argv and argv[0] == 'with':
            argv.pop(0)
        for token in argv:
            if token in self._named_configs:
                self.config.update(self._named_configs[token])
            else:
                assert '=' in token, (
                    f'Cannot parse override {token!r}; expected key=value '
                    f'or a named config out of '
                    f'{sorted(self._named_configs)}')
                key, value = token.split('=', 1)
                self.config[key] = _parse_value(value)
        return command, storage_dir

    @staticmethod
    def _honor_jax_platforms_env():
        """This image's TPU plugin (sitecustomize) overrides the
        JAX_PLATFORMS env var; re-apply the user's choice through the
        config API so `JAX_PLATFORMS=cpu ./ci.sh` really runs on CPU."""
        platforms = os.environ.get('JAX_PLATFORMS')
        if platforms and 'axon' not in platforms:
            try:
                import jax
                jax.config.update('jax_platforms', platforms)
            except Exception:
                pass

    @staticmethod
    def _broadcast_run_id(run_id: int) -> int:
        """Share the master's run id with all hosts (the reference bcasts
        the sacred run dir over MPI, run.py:98).  No-op single-host."""
        try:
            import jax
            if jax.process_count() <= 1:
                return run_id
            import numpy as np
            from jax.experimental import multihost_utils
            arr = multihost_utils.broadcast_one_to_all(
                np.asarray([run_id], np.int32))
            return int(arr[0])
        except Exception:
            return run_id

    def run_commandline(self, argv=None, create_run_dir=True):
        self._honor_jax_platforms_env()
        # multi-host: join jax.distributed before allocating the run dir
        try:
            from pb_chime5_tpu.parallel.distributed import maybe_initialize
            maybe_initialize()
        except Exception:
            pass
        command, storage_dir = self.parse_argv(argv)
        if command not in self._commands:
            raise SystemExit(
                f'Unknown command {command!r}; available: '
                f'{sorted(self._commands)}')
        if create_run_dir:
            # master allocates the run dir; other hosts join it
            is_master = True
            try:
                import jax
                is_master = jax.process_index() == 0
            except Exception:
                pass
            if is_master:
                self.run_dir = self._create_run_dir(storage_dir)
            run_id = self._broadcast_run_id(
                int(self.run_dir.name) if self.run_dir is not None else -1)
            if not is_master:
                self.run_dir = Path(storage_dir) / str(run_id)
            print(f'Experiment dir: {self.run_dir}')
        # print_config (sacred prints the resolved config on the master)
        print('Configuration:')
        for key in sorted(self.config):
            print(f'  {key} = {self.config[key]!r}')
        try:
            result = self._commands[command](self)
        except BaseException:
            self.finalize_run('FAILED')
            raise
        self.finalize_run('COMPLETED')
        return result
