''' alias for kvarq_tpu.cli (same module object) '''
import sys
import kvarq_tpu.cli
sys.modules[__name__] = kvarq_tpu.cli
