''' alias for kvarq_tpu.gui.util (same module object) '''
import sys
import kvarq_tpu.gui.util
sys.modules[__name__] = kvarq_tpu.gui.util
