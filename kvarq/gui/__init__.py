''' alias for kvarq_tpu.gui (same module object) '''
import sys
import kvarq_tpu.gui
sys.modules[__name__] = kvarq_tpu.gui
