''' alias for kvarq_tpu.gui.simple (same module object) '''
import sys
import kvarq_tpu.gui.simple
sys.modules[__name__] = kvarq_tpu.gui.simple
