''' alias for kvarq_tpu.analyse (same module object) '''
import sys
import kvarq_tpu.analyse
sys.modules[__name__] = kvarq_tpu.analyse
