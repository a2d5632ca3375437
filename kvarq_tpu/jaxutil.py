'''
Process-wide JAX configuration helpers.

On remote/tunneled TPU attachments a cold jit compile of the scan graph
costs *minutes* (measured 500-1000 s for the fused kernel + accumulation
graph -- the compile service is shared and queued), and every CLI
invocation is a fresh process -- so the persistent compilation cache is
the difference between a ~20 s and a ~15 min first `kvarq scan`.

To make even the *first-ever* run fast, the package ships precompiled
cache entries for the flagship shapes (MTBC bank, Lpad=128 pallas scan
step) in ``kvarq_tpu/_precompiled/``; they are copied into the writable
cache directory on first use.  This is the TPU-native analogue of the
reference compiling its C engine once at install time
(/root/reference/setup.py:31-35).  Regenerate with
``python tools/seed_cache.py`` after kernel/graph changes.
'''

import os
import shutil

_done = False


def ensure_compilation_cache():
    ''' enable JAX's on-disk executable cache and pre-seed it from the
        in-repo precompiled entries (idempotent, best-effort).

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
        # CRITICAL for shipping precompiled entries: by default jax
        # derives an XLA autotune-cache path from the compilation cache
        # dir and embeds it in compile_options, which is hashed into the
        # cache KEY -- so identical programs get different keys under
        # different cache dirs (measured; this silently defeated seeding
        # in round 2).  Disable the embedded XLA caches so keys depend
        # only on program + toolchain + device.
        jax.config.update('jax_persistent_cache_enable_xla_caches', 'none')
        # ...and so do SOURCE LOCATIONS: Mosaic serializes the kernel MLIR
        # with full tracebacks, which reach down to the entry script
        # ('<stdin>' vs 'bench.py' vs 'tools/seed_cache.py'), so the same
        # scan compiled from two scripts got two different keys (measured:
        # the pallas custom_call payload differed only in its location
        # string table).  Dropping tracebacks from locations makes keys
        # caller-independent; error messages keep their Python tracebacks.
        jax.config.update('jax_traceback_in_locations_limit', 0)
        _seed_from_precompiled(path)
    except Exception:   # pragma: no cover -- older jax / readonly fs
        pass


def _seed_from_precompiled(path):
    ''' copy the shipped precompiled executables into the cache dir (a
        cache *key* miss -- different jax/runtime/device -- just means
        the entry is ignored and the normal compile path runs) '''
    seed = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        '_precompiled')
    if not os.path.isdir(seed):
        return
    if os.path.exists(path) and os.path.samefile(seed, path):
        return   # seeding into itself (tools/seed_cache.py does this)
    try:
        names = os.listdir(seed)
    except OSError:   # pragma: no cover
        return
    for name in names:
        if not name.endswith('-cache'):
            continue
        dst = os.path.join(path, name)
        if os.path.exists(dst):
            continue
        try:
            shutil.copyfile(os.path.join(seed, name), dst)
        except OSError:   # pragma: no cover -- read-only cache dir
            pass
