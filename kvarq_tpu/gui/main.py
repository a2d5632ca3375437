'''
Launcher window with live log pane (reference kvarq/gui/main.py): buttons
for scanning, exploring, settings and help next to a color-coded log view
fed by a logging handler on the ``kvarq`` logger.
'''

import logging
import sys
import tkinter as tk
import tkinter.font as tkfont
import tkinter.messagebox as tkmessagebox

from kvarq_tpu.log import lo, logfn
from kvarq_tpu.config import default_config
from kvarq_tpu.gui.settings import Settings
from kvarq_tpu.gui.simple import SimpleGUI
from kvarq_tpu.gui.explorer import DirectoryExplorer
from kvarq_tpu.gui.util import open_help, ThemedTk


class GuiLogHandler(logging.Handler):
    ''' renders kvarq log records into a Text widget with per-level colors
        (reference gui/main.py:18-64) '''

    def __init__(self, text, scrollfn):
        logging.Handler.__init__(self)
        self.setLevel(logging.DEBUG)

        boldfont = tkfont.Font(text, family='Courier New', size=13,
                               weight='bold')
        text.tag_config('debug', foreground='#888')
        text.tag_config('info', foreground='#080')
        text.tag_config('bold', font=boldfont)
        text.tag_config('warning', background='red', foreground='white')
        text.tag_config('error', background='red', foreground='white')
        text.configure(state='disabled')

        self.text = text
        self.scrollfn = scrollfn
        self.fmt = logging.Formatter('[%(levelname)s] %(message)s')

    def emit(self, record):
        try:
            self.text.insert('end', '')
        except Exception:
            return  # window destroyed

        msg = self.fmt.format(record)
        self.text.config(state='normal')
        if msg.startswith('[DEBUG]'):
            self.text.insert('end', msg + '\n', ('debug',))
        elif msg.startswith('[INFO]'):
            self.text.insert('end', msg[:6], ('info',))
            self.text.insert('end', msg[6:] + '\n')
        elif msg.startswith('[WARNING]'):
            self.text.insert('end', msg[:9], ('warning',))
            self.text.insert('end', msg[9:] + '\n', ('bold',))
        elif msg.startswith('[ERROR]'):
            self.text.insert('end', msg[:7], ('error',))
            self.text.insert('end', msg[7:] + '\n', ('bold',))
        else:
            self.text.insert('end', msg + '\n')
        self.text.configure(state='disabled')
        self.scrollfn()


class MainGUI(ThemedTk):

    def __init__(self, testsuite_paths):
        ThemedTk.__init__(self)

        self.settings = Settings(default_config)
        self.testsuite_paths = testsuite_paths
        self.testsuites = {}

        frame = tk.Frame(self)
        self.scan = tk.Button(frame, text='scan .fastq files',
                              command=self.do_scan)
        self.scan.pack()
        self.explore = tk.Button(frame, text='explore .json files',
                                 command=self.do_explore)
        self.explore.pack()
        tk.Label(frame).pack()
        self.config_ = tk.Button(frame, text='settings',
                                 command=self.do_config)
        self.config_.pack()
        self.help = tk.Button(frame, text='help', command=open_help)
        self.help.pack()
        if logfn:
            self.showlog = tk.Button(frame, text='show log file',
                                     command=self.do_showlog)
            self.showlog.pack()
        frame.pack(side='left', padx=10)

        outer = tk.Frame(self, borderwidth=1, relief='ridge')
        outer.pack(side='left', expand=True, fill='both', padx=5, pady=5)
        tk.Label(outer, text='kvarq log output').pack()
        frame = tk.Frame(outer)
        frame.pack(expand=True, fill='both')
        self.text = tk.Text(frame)
        self.text.pack(side=tk.LEFT, fill=tk.BOTH, expand=True)
        scroll = tk.Scrollbar(frame, command=self.text.yview)
        scroll.pack(side=tk.RIGHT, fill=tk.Y)
        self.text.config(yscrollcommand=scroll.set)
        self.text.yscrollbar = scroll

        def sys_exit():
            if tkmessagebox.askyesno(
                    'quit KvarQ',
                    'really want to exit KvarQ and close all windows?'):
                sys.exit(0)
        self.protocol('WM_DELETE_WINDOW', sys_exit)

        self.log_handler = GuiLogHandler(self.text, self.scrolldown)
        lo.addHandler(self.log_handler)
        lo.debug('GUI started')

    def do_config(self, e=None):
        self.settings.show()

    def do_scan(self, e=None):
        SimpleGUI(self.settings, testsuites=self.testsuites,
                  testsuite_paths=self.testsuite_paths)

    def do_explore(self, e=None):
        DirectoryExplorer(None, testsuites=self.testsuites,
                          testsuite_paths=self.testsuite_paths)

    def do_showlog(self, e=None):
        logwin = ThemedTk(title='contents of logfile (%s)' % logfn,
                          geometry=(-200, -200))
        frame = tk.Frame(logwin)
        text = tk.Text(frame)
        text.pack(side=tk.LEFT, fill=tk.BOTH, expand=True)
        scroll = tk.Scrollbar(frame, command=text.yview)
        scroll.pack(side=tk.RIGHT, fill=tk.Y)
        text.config(yscrollcommand=scroll.set)
        frame.pack(side=tk.TOP, expand=True, fill=tk.BOTH)
        with open(logfn) as f:
            for line in f:
                text.insert(tk.END, line)
        text.yview('moveto', 1.0)

    def scrolldown(self):
        yy = self.text.yscrollbar.get()
        self.text.yscrollbar.set(1 - yy[1] + yy[0], 1)
        self.text.yview('moveto', 1 - yy[1] + yy[0])
