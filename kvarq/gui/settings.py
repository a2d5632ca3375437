''' alias for kvarq_tpu.gui.settings (same module object) '''
import sys
import kvarq_tpu.gui.settings
sys.modules[__name__] = kvarq_tpu.gui.settings
