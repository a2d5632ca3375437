''' alias for kvarq_tpu.testsuites (same module object) '''
import sys
import kvarq_tpu.testsuites
sys.modules[__name__] = kvarq_tpu.testsuites
