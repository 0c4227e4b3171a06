"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment may pre-import jax with a TPU platform plugin (via
sitecustomize); the backend itself initializes lazily, so overriding the
platform + XLA flags here (before any device query) still takes effect.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

if 'jax' in sys.modules:
    import jax
    jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
