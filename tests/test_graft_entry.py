"""Driver hooks must work exactly as the driver calls them.

The driver imports __graft_entry__ and calls dryrun_multichip(n) as a bare
function with NO env vars set — the function itself must force the virtual
CPU mesh (round-1 failure mode: it grabbed the real TPU backend and died).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_bare_subprocess():
    """Fresh subprocess, JAX_PLATFORMS/XLA_FLAGS scrubbed from the env."""
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    proc = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__; __graft_entry__.dryrun_multichip(8)'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'one sharded train step OK' in proc.stdout


def test_dryrun_multichip_survives_preinitialized_backend():
    """Even if the caller already initialized a (CPU) backend with the wrong
    device count, the function must rebuild an n-device mesh."""
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)  # default: 1 CPU device
    code = (
        # Initialize a 1-device CPU backend first. The in-process config
        # update matters: the axon sitecustomize merges the TPU platform in
        # regardless of the env var, and touching the tunnel here makes the
        # test flaky whenever another process (a bench) holds the chip —
        # the driver itself exercises the preinitialized-TPU variant.
        'import jax; jax.config.update("jax_platforms", "cpu"); '
        'jax.devices(); '
        'import __graft_entry__; __graft_entry__.dryrun_multichip(8)')
    proc = subprocess.run([sys.executable, '-c', code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'mesh dp=' in proc.stdout
