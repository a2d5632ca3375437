import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path).  Respect pre-set values so the same suite can be pointed
# at real hardware.
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

# the small-input numpy fast path would hide the tensor-scan code from
# every fixture-sized countseqs test; disable it suite-wide (the path has
# its own dedicated parity test that re-enables it)
os.environ.setdefault('KVARQ_SMALL_SCAN', '0')

if os.environ.get('KVARQ_TEST_TPU') != '1':
    # The environment may pin JAX_PLATFORMS (e.g. to a tunneled TPU) via
    # sitecustomize, so plain env vars are not enough -- force the CPU
    # backend through the config API before any backend initialization.
    os.environ['JAX_PLATFORMS'] = 'cpu'
    try:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass

import pytest  # noqa: E402

HERE = os.path.abspath(os.path.dirname(__file__))


@pytest.fixture
def fastqs_dir():
    return os.path.join(HERE, 'fastqs')


@pytest.fixture(autouse=True)
def reset_engine_config():
    ''' every test starts from the engine's built-in defaults '''
    from kvarq_tpu import engine
    engine.config(maxerrors=0, minoverlap=20, minreadlength=10,
                  nthreads=1, Amin='!', Azero='!',
                  mesh=os.environ.get('KVARQ_MESH', ''),
                  backend=os.environ.get('KVARQ_BACKEND', 'auto'),
                  sieve=os.environ.get('KVARQ_SIEVE', 'auto'),
                  batchsize=int(os.environ.get('KVARQ_BATCHSIZE', '16384')))
    yield
