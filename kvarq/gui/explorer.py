''' alias for kvarq_tpu.gui.explorer (same module object) '''
import sys
import kvarq_tpu.gui.explorer
sys.modules[__name__] = kvarq_tpu.gui.explorer
