''' alias for kvarq_tpu.log (same module object, shared logger) '''
import sys
import kvarq_tpu.log
sys.modules[__name__] = kvarq_tpu.log
