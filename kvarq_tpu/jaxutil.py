'''
Process-wide JAX configuration helpers.

On remote/tunneled TPU attachments a cold jit compile costs tens of
seconds, and every CLI invocation is a fresh process -- so the persistent
compilation cache is the difference between a ~30 s and a ~1 s `kvarq
scan` on warm banks.  (The reference pays no equivalent cost: its C
engine is compiled once at install time; this is the TPU-native
analogue.)
'''

import os

_done = False


def ensure_compilation_cache():
    ''' enable JAX's on-disk executable cache (idempotent, best-effort).

        Respects ``JAX_COMPILATION_CACHE_DIR`` when set; defaults to
        ``~/.cache/kvarq_tpu/jax``.  Set ``KVARQ_JAX_CACHE=0`` to disable. '''
    global _done
    if _done:
        return
    _done = True
    if os.environ.get('KVARQ_JAX_CACHE', '1') == '0':
        return
    try:
        import jax
        path = os.environ.get('JAX_COMPILATION_CACHE_DIR') \
            or os.path.expanduser('~/.cache/kvarq_tpu/jax')
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # cache everything that took noticeable compile time
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:   # pragma: no cover -- older jax / readonly fs
        pass
