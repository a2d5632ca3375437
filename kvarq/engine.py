''' alias for kvarq_tpu.engine (same module object, shared state) '''
import sys
import kvarq_tpu.engine
sys.modules[__name__] = kvarq_tpu.engine
