''' alias for kvarq_tpu.legacy (same module object) '''
import sys
import kvarq_tpu.legacy
sys.modules[__name__] = kvarq_tpu.legacy
