''' alias for kvarq_tpu.util (same module object) '''
import sys
import kvarq_tpu.util
sys.modules[__name__] = kvarq_tpu.util
