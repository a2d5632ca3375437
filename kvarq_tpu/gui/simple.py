'''
Scan wizard (reference kvarq/gui/simple.py): multi-file selection with
``_1/_2`` pair merging, testsuite checkbox selector, scan on a worker
thread with 100 ms progress polling, then show results in the explorer or
save per-file ``.json`` s.
'''

import json
import os
import threading
import time
import tkinter as tk
import tkinter.filedialog as tkfiledialog
import tkinter.messagebox as tkmessagebox

from kvarq_tpu import analyse, engine
from kvarq_tpu.log import lo, tic, toc
from kvarq_tpu.fastq import Fastq, FastqFileFormatException
from kvarq_tpu.util import ProgressBar
from kvarq_tpu.config import config_params
from kvarq_tpu.testsuites import load_testsuites
from kvarq_tpu.gui.explorer import JsonExplorer
from kvarq_tpu.gui.util import ThemedTk, askopenfilename


class AnalyseThread(threading.Thread):

    def __init__(self, analyser, fastq, testsuites):
        super().__init__(name='analyse-thread')
        self.analyser = analyser
        self.fastq = fastq
        self.testsuites = testsuites
        self.finished = False
        self.exception = None
        self.stopped = False

    def run(self):
        try:
            self.analyser.scan(self.fastq, self.testsuites)
            self.finished = True
        except Exception as e:
            self.exception = e

    def stop(self):
        engine.stop()
        self.stopped = True


class TestsuiteSelector(ThemedTk):

    def __init__(self, testsuite_paths):
        ThemedTk.__init__(self)
        tk.Label(self, text='select testsuites for scan:').pack(anchor='w')

        self.values = {}
        self.buttons = []
        for name in sorted(testsuite_paths):
            self.values[name] = False

            def make_toggle(name):
                def toggle(e=None):
                    self.values[name] = not self.values[name]
                return toggle

            button = tk.Checkbutton(self, text=name,
                                    command=make_toggle(name))
            button.pack(anchor='w')
            self.buttons.append(button)

        self.disabled = False
        self.closed = False
        self.protocol('WM_DELETE_WINDOW', self.closing)

    def closing(self, e=None):
        self.closed = True
        self.destroy()

    def selection(self):
        return [name for name, value in self.values.items() if value]

    def disable(self):
        if not self.closed:
            for button in self.buttons:
                button.config(state='disabled')
        self.disabled = True


def pair_fastqs(fastqs):
    ''' sort selected files and merge ``X_1.fastq`` / ``X_2.fastq`` pairs
        into single paired scans (reference gui/simple.py:166-199) '''
    fastqs = sorted(fastqs)
    paireds = []
    idx = 0
    while idx < len(fastqs) - 1:
        base1 = fastqs[idx][:fastqs[idx].rindex('.fastq')]
        base2 = fastqs[idx + 1][:fastqs[idx + 1].rindex('.fastq')]
        if (len(base1) > 2 and len(base2) > 2 and base1[-2:] == '_1'
                and base2[-2:] == '_2' and base1[:-2] == base2[:-2]):
            paireds.append(True)
            del fastqs[idx + 1]
        else:
            paireds.append(False)
        idx += 1
    paireds.append(False)
    return fastqs, paireds


class SimpleGUI(ThemedTk):

    def __init__(self, settings, testsuites, testsuite_paths):
        self.settings = settings
        self.testsuites = testsuites        # all loaded testsuites
        self.testsuite_paths = testsuite_paths

        self.fastqi = -1
        self.analysers = {}
        self.fastqs, self.paireds = self.askfastqs()
        if self.fastqs is not None:
            self.init_gui()
            self.next_fastq()

    def init_gui(self):
        ThemedTk.__init__(self, title='scan .fastq files')
        self.bind('<Destroy>', self.destroy_cb)

        self.selector = TestsuiteSelector(self.testsuite_paths)
        self.selected_testsuites = {}
        self.analyser = None
        self.running = False
        self.save_hits = False

        frame = tk.Frame(self)
        self.fname = tk.Label(frame)
        self.fname.pack(side=tk.LEFT)
        frame.pack(side=tk.TOP, expand=False, fill=tk.X)

        frame = tk.Frame(self)
        self.start = tk.Button(frame, text='start', command=self.startstop,
                               state=tk.DISABLED)
        self.start.pack(side=tk.LEFT)
        self.pb = ProgressBar(total=1., r='')
        self.pb_longest = 0
        self.pblabel = tk.Label(frame, text=' ' * 70, font=self.monospace)
        self.pblabel.pack(side=tk.LEFT)
        frame.pack(side=tk.TOP, expand=False, fill=tk.X)

        frame = tk.Frame(self)
        self.show = tk.Button(frame, text='show', command=self.show_cb,
                              state=tk.DISABLED)
        self.show.pack(side=tk.LEFT)
        self.save = tk.Button(frame, text='save', command=self.save_cb,
                              state=tk.DISABLED)
        self.save.pack(side=tk.LEFT)
        frame.pack(side=tk.TOP, expand=False, fill=tk.X)

        if len(self.fastqs) > 1:
            self.show.config(text='show last')
            self.save.config(text='save all')

        self.resizable(0, 0)
        self.protocol('WM_DELETE_WINDOW', self.closing)

    def closing(self, e=None):
        if not self.selector.closed:
            self.selector.destroy()
        self.destroy()

    def askfastqs(self):
        ''' :returns: ``(fastqs, paireds)`` -- selected files with booleans
            marking paired scans -- or ``(None, None)`` if canceled '''
        fastqs = askopenfilename(
            initialdir=os.getcwd(), multiple=True,
            filetypes=[('fastq files', '*.fastq'),
                       ('compressed fastq files', '*.fastq.gz')],
            title='select .fastq files to analyze')
        if not fastqs:
            return None, None
        return pair_fastqs(list(fastqs))

    def has_more_fastq(self):
        return self.fastqi + 1 < len(self.fastqs)

    def next_fastq(self):
        n = len(self.fastqs)
        while True:
            self.fastqi += 1
            if self.fastqi >= n:
                return False
            try:
                self.fastq = Fastq(self.fastqs[self.fastqi],
                                   paired=self.paireds[self.fastqi])
            except FastqFileFormatException as e:
                lo.error('cannot load file %s : %s'
                         % (self.fastqs[self.fastqi], e))
                if n == 1:
                    tkmessagebox.showerror(
                        'invalid .fastq file',
                        'the selected file cannot be parsed : ' + str(e))
                continue

            if n == 1:
                self.fname.config(text=self.fastq.fname)
            else:
                self.fname.config(text='%s (file %d/%d)' % (
                    self.fastq.fname, self.fastqi + 1, n))
            self.start.config(state=tk.NORMAL)
            return True

    def startstop(self):
        if not self.selected_testsuites:
            selection = self.selector.selection()
            if not selection:
                tkmessagebox.showerror(
                    'no testsuite selected',
                    'please select at least one testsuite before scanning')
                if self.selector.closed:
                    self.selector = TestsuiteSelector(self.testsuite_paths)
                return
            difference = set(selection) - set(self.testsuites.keys())
            self.selector.disable()
            self.testsuites.update(
                load_testsuites(self.testsuite_paths, difference))
            for name in selection:
                self.selected_testsuites[name] = self.testsuites[name]

        if not self.running:
            self.analyser = analyse.Analyser()
            engine.config(**config_params(self.settings.config, self.fastq))
            self.at = AnalyseThread(self.analyser, self.fastq,
                                    self.selected_testsuites)
            self.t0 = time.time()
            self.at.start()
            self.pb.start()
            self.after(100, self.update)
            lo.info('start scanning %s (%d MB)' % (
                self.fastq.fname,
                os.path.getsize(self.fastq.fname) // 1024 ** 2))
            self.running = True
            self.start.config(text='stop')
        else:
            if self.has_more_fastq():
                if self.next_fastq():
                    self.start.config(text='start next')
                else:
                    self.start.config(state=tk.DISABLED)
            else:
                self.start.config(state=tk.DISABLED)
            self.running = False

    def finish_scanning(self):
        lo.info('analyzing data...')
        self.analyser.update_testsuites()
        lo.info('done analyzing data')
        self.analysers[self.fastqs[self.fastqi]] = self.analyser
        self.show.config(state=tk.NORMAL)
        self.save.config(state=tk.NORMAL)

    def update(self):
        if not self.running:
            # "stop" was clicked: compute results from partial data
            self.at.stop()
            lo.info('STOPPED scanning via GUI after %.3f seconds'
                    % (time.time() - self.t0))
            self.finish_scanning()
            self.running = False
            self.at = None
            return

        stats = engine.stats()
        self.pb.update(stats['progress'])
        pb_str = str(self.pb)
        self.pb_longest = max(self.pb_longest, len(pb_str))
        self.pblabel.config(
            text=('{:<%d}' % self.pb_longest).format(pb_str))

        if self.at.finished or self.at.exception:
            self.at.join()
            self.start.config(state=tk.DISABLED)
            if self.at.finished:
                lo.info('finished scanning after %.3f seconds'
                        % (time.time() - self.t0))
                pb_str = str(self.pb)
                self.pblabel.config(
                    text=pb_str[:pb_str.index(']') + 1] + ' -- done')
                self.finish_scanning()
            if self.at.exception:
                lo.error('could not scan %s : %s'
                         % (self.fastq.fname, self.at.exception))
                tkmessagebox.showerror(
                    'could not scan',
                    'the scanning of the file "%s" could not be '
                    'completed : %s' % (self.fastq.fname,
                                        self.at.exception))
            self.running = False
            self.at = None
            if self.next_fastq():
                self.startstop()
            return

        self.after(100, self.update)

    def show_cb(self):
        if self.analyser.results is None:
            tkmessagebox.showinfo('no results yet',
                                  'please stop/finish the scanning first')
            return
        JsonExplorer(self.analyser, testsuites=self.testsuites,
                     testsuite_paths=self.testsuite_paths)

    def save_cb(self):
        if len(self.analysers) == 1:
            jf = tkfiledialog.asksaveasfile(
                parent=self,
                initialfile=os.path.splitext(os.path.basename(
                    self.fastq.fname))[0] + '.json',
                initialdir=os.path.dirname(self.fastq.fname),
                defaultextension='.json',
                title='select .json to store results of scan')
            if not jf:
                return
            tic('dumping json')
            json.dump(self.analyser.encode(hits=self.save_hits), jf,
                      indent=2)
            toc('dumping json')
        else:
            jd = tkfiledialog.askdirectory(
                parent=self,
                title='select directory to store .json files')
            if not jd:
                return
            for fastq, analyser in self.analysers.items():
                base = os.path.splitext(os.path.basename(fastq))[0]
                while True:
                    jsonfn = os.path.join(jd, base + '.json')
                    if not os.path.exists(jsonfn):
                        break
                    base += '_'
                lo.info('saving to ' + jsonfn)
                tic('dumping json')
                with open(jsonfn, 'w') as f:
                    json.dump(analyser.encode(hits=self.save_hits), f,
                              indent=2)
                toc('dumping json')

    def destroy_cb(self, x=None):
        if self.running:
            self.at.stop()
            self.at.join()
