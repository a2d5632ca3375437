''' alias for kvarq_tpu.config (same module object) '''
import sys
import kvarq_tpu.config
sys.modules[__name__] = kvarq_tpu.config
