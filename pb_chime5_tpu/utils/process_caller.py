"""subprocess.run wrapper with captured-stdio error reporting
(reference: pb_chime5/utils/process_caller.py)."""

import os
import subprocess

__all__ = ['run_process']

DEBUG_MODE = False


def run_process(cmd, *, shell=None, check=True, environment=None, cwd=None,
                input=None, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                universal_newlines=True):
    """Run a command; on failure raise CalledProcessError whose message
    includes the captured stdout/stderr (the reference's main improvement
    over plain subprocess.run).

    ``shell`` is auto-detected from the cmd type when not given (string ->
    shell, list -> exec), like the reference.
    """
    if shell is None:
        shell = isinstance(cmd, str)
    if environment is None:
        environment = os.environ
    try:
        return subprocess.run(
            cmd,
            input=input,
            universal_newlines=universal_newlines,
            shell=shell,
            stdout=stdout,
            stderr=stderr,
            check=check,
            env=environment,
            cwd=cwd,
        )
    except subprocess.CalledProcessError as e:
        raise subprocess.CalledProcessError(
            returncode=e.returncode,
            cmd=(f'{e.cmd}\n\nstdout:\n{e.stdout}\n\nstderr:\n{e.stderr}'),
            output=e.output,
            stderr=e.stderr,
        ) from None
