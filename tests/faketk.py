'''
Headless Tk double for driving the real GUI code paths without any X
server (this environment ships no Xvfb/Xorg and nothing may be
installed, so widget tests cannot use a virtual display).

This is NOT a mock of the application -- the application modules run
unmodified; only the ``tkinter`` module family is replaced by in-memory
widgets that record construction, options, packing, canvas items and
event bindings, and execute ``after``-scheduled callbacks through an
explicit :py:func:`pump` so the GUI's timer-driven flows (scan polling,
explorer refresh, background jobs) run to completion deterministically.
What this cannot verify is Tk itself (real rendering/layout); what it
does verify is every line of kvarq_tpu/gui/*.py logic, which the
reference never executed at all (its tests/test_gui.py is a manual
checklist).

Usage (see tests/test_gui.py)::

    with faketk.installed():
        import kvarq_tpu.gui.simple as simple   # rebound to the fake
        ...drive widgets, faketk.pump()...
'''

import contextlib
import importlib
import sys
import types

# --- scheduler ----------------------------------------------------------------

_after_queue = []   # [(id, callback, args)]
_after_next_id = [1]


def pump(rounds=10000, until=None):
    ''' run scheduled ``after`` callbacks FIFO (delays are ignored) until
        the queue drains, ``until()`` turns true, or ``rounds`` expires '''
    for _ in range(rounds):
        if until is not None and until():
            return True
        if not _after_queue:
            if until is None:
                return True
            # nothing scheduled but condition pending: let worker threads
            # make progress
            import time
            time.sleep(0.01)
            continue
        _, cb, args = _after_queue.pop(0)
        if cb is not None:
            cb(*args)
    return until is None or until()


def reset():
    del _after_queue[:]
    Widget.ALL.clear()
    messagebox.calls.clear()


# --- events / variables ---------------------------------------------------------

class Event:
    def __init__(self, **kw):
        self.x = self.y = 0
        self.widget = None
        self.__dict__.update(kw)


class Variable:
    def __init__(self, master=None, value=None, name=None):
        self._value = value
    def get(self):
        return self._value
    def set(self, value):
        self._value = value


class StringVar(Variable):
    def __init__(self, master=None, value='', name=None):
        super().__init__(master, value, name)


class IntVar(Variable):
    def __init__(self, master=None, value=0, name=None):
        super().__init__(master, value, name)


class BooleanVar(Variable):
    def __init__(self, master=None, value=False, name=None):
        super().__init__(master, value, name)


class _FakeTcl:
    def splitlist(self, s):
        if isinstance(s, (list, tuple)):
            return tuple(s)
        return tuple(str(s).split())
    def call(self, *args):
        return ''
    def eval(self, *args):
        return ''


# --- widgets -------------------------------------------------------------------

class Widget:
    ''' permissive recording widget: every option, child, binding and
        canvas item is retrievable by tests '''

    ALL = []   # every widget constructed (for assertions)

    def __init__(self, master=None, cnf=None, **kw):
        self.master = master
        self.kw = dict(cnf or {})
        self.kw.update(kw)
        self.children = []
        self.bindings = {}
        self.protocols = {}
        self.destroyed = False
        self.packed = None
        self.tk = _FakeTcl()
        Widget.ALL.append(self)
        if master is not None and isinstance(master, Widget):
            master.children.append(self)

    # options
    def config(self, cnf=None, **kw):
        if isinstance(cnf, str):        # config('text') -> tuple form
            return (cnf, cnf, cnf, '', self.kw.get(cnf))
        self.kw.update(cnf or {})
        self.kw.update(kw)
    configure = config
    def cget(self, key):
        return self.kw.get(key)
    __getitem__ = cget
    def __setitem__(self, key, value):
        self.kw[key] = value
    def keys(self):
        return list(self.kw)

    # geometry managers (recorded, not computed)
    def pack(self, *a, **kw):
        self.packed = ('pack', kw)
    def grid(self, *a, **kw):
        self.packed = ('grid', kw)
    def place(self, *a, **kw):
        self.packed = ('place', kw)
    def pack_forget(self):
        self.packed = None
    grid_forget = place_forget = pack_forget
    def columnconfigure(self, *a, **kw):
        pass
    rowconfigure = columnconfigure
    def grid_columnconfigure(self, *a, **kw):
        pass
    grid_rowconfigure = grid_columnconfigure

    # events
    def bind(self, seq, fn=None, add=None):
        self.bindings[seq] = fn
        return seq
    def unbind(self, seq, funcid=None):
        self.bindings.pop(seq, None)
    def event_generate(self, seq, **kw):
        fn = self.bindings.get(seq)
        if fn is not None:
            return fn(Event(widget=self, **kw))
    def protocol(self, name=None, func=None):
        self.protocols[name] = func
    def invoke_protocol(self, name):
        fn = self.protocols.get(name)
        if fn is not None:
            return fn()

    # timers
    def after(self, ms, func=None, *args):
        aid = 'after#%d' % _after_next_id[0]
        _after_next_id[0] += 1
        _after_queue.append((aid, func, args))
        return aid
    def after_cancel(self, aid):
        _after_queue[:] = [e for e in _after_queue if e[0] != aid]
    def after_idle(self, func, *args):
        return self.after(0, func, *args)

    # window-ish
    def winfo_screenwidth(self):
        return 1280
    def winfo_screenheight(self):
        return 800
    def winfo_width(self):
        return int(self.kw.get('width') or 400)
    def winfo_height(self):
        return int(self.kw.get('height') or 300)
    def winfo_reqwidth(self):
        return self.winfo_width()
    def winfo_reqheight(self):
        return self.winfo_height()
    def winfo_exists(self):
        return not self.destroyed
    def winfo_toplevel(self):
        return self
    def winfo_children(self):
        return list(self.children)
    def update(self):
        pass
    def update_idletasks(self):
        pass
    def destroy(self):
        self.destroyed = True
        for child in list(self.children):
            child.destroy()
    def quit(self):
        pass
    def focus_set(self):
        pass
    focus = focus_force = lift = lower = focus_set
    def grab_set(self):
        pass
    def grab_release(self):
        pass
    def wait_window(self, other=None):
        pass
    def mainloop(self, n=0):
        pump()

    # wm
    def wm_title(self, title=None):
        if title is not None:
            self.kw['wm_title'] = title
        return self.kw.get('wm_title', '')
    title = wm_title
    def geometry(self, spec=None):
        if spec is not None:
            self.kw['geometry'] = spec
        return self.kw.get('geometry', '400x300+0+0')
    def resizable(self, *a):
        pass
    def withdraw(self):
        pass
    def deiconify(self):
        pass
    def iconify(self):
        pass
    def transient(self, other=None):
        pass
    def state(self, *a):
        return 'normal'


class Tk(Widget):
    def __init__(self, screenName=None, baseName=None, className='Tk',
                 useTk=True, sync=False, use=None):
        super().__init__(None)


class Toplevel(Widget):
    pass


class Frame(Widget):
    pass


class LabelFrame(Widget):
    pass


class Label(Widget):
    pass


class Button(Widget):
    def invoke(self):
        if self.kw.get('state') in ('disabled', DISABLED):
            return
        command = self.kw.get('command')
        if command:
            return command()


class Checkbutton(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._on = False
    def invoke(self):
        self._on = not self._on
        var = self.kw.get('variable')
        if var is not None:
            var.set(1 if self._on else 0)
        command = self.kw.get('command')
        if command:
            return command()
    def select(self):
        self._on = True
    def deselect(self):
        self._on = False
    def toggle(self):
        self._on = not self._on


class Entry(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._text = ''
    def insert(self, index, text):
        i = len(self._text) if index in (END, 'end') else int(index)
        self._text = self._text[:i] + str(text) + self._text[i:]
    def delete(self, first, last=None):
        if first in (0, '0') and last in (END, 'end'):
            self._text = ''
    def get(self):
        return self._text


class Text(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._lines = []
    def insert(self, index, text, *tags):
        self._lines.append(str(text))
    def delete(self, first, last=None):
        self._lines = []
    def get(self, first='1.0', last=None):
        return ''.join(self._lines)
    def see(self, index):
        pass
    def index(self, what):
        return '%d.0' % (len(self._lines) + 1)
    def yview(self, *a):
        pass
    def tag_config(self, *a, **kw):
        pass
    tag_configure = tag_config


class Listbox(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.items = []
        self._selection = ()
    def insert(self, index, *items):
        i = len(self.items) if index in (END, 'end') else int(index)
        self.items[i:i] = [str(it) for it in items]
    def delete(self, first, last=None):
        if last in (END, 'end'):
            first = int(first)
            self.items[first:] = []
            self._selection = tuple(i for i in self._selection if i < first)
        elif last is None:
            del self.items[int(first)]
        else:
            del self.items[int(first):int(last) + 1]
    def get(self, first, last=None):
        if last is None:
            return self.items[int(first)]
        if last in (END, 'end'):
            last = len(self.items) - 1
        return tuple(self.items[int(first):int(last) + 1])
    def size(self):
        return len(self.items)
    def curselection(self):
        return self._selection
    def selection_set(self, first, last=None):
        self._selection = (int(first),)
    select_set = selection_set
    def selection_clear(self, first=None, last=None):
        self._selection = ()
    select_clear = selection_clear
    def activate(self, index):
        pass
    def see(self, index):
        pass
    def yview(self, *a):
        pass


class Scrollbar(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._range = (0.0, 1.0)
    def set(self, lo, hi):
        self._range = (float(lo), float(hi))
    def get(self):
        return self._range


class Canvas(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.items = []   # (kind, coords, options)
        self._next_item = 1
    def _create(self, kind, coords, kw):
        self.items.append((kind, tuple(coords), dict(kw)))
        self._next_item += 1
        return self._next_item - 1
    def create_line(self, *coords, **kw):
        return self._create('line', coords, kw)
    def create_rectangle(self, *coords, **kw):
        return self._create('rectangle', coords, kw)
    def create_text(self, *coords, **kw):
        return self._create('text', coords, kw)
    def create_polygon(self, *coords, **kw):
        return self._create('polygon', coords, kw)
    def create_oval(self, *coords, **kw):
        return self._create('oval', coords, kw)
    def delete(self, *items):
        if 'all' in items or ALL in items:
            self.items = []
    def bbox(self, *a):
        return (0, 0, 10, 10)
    def coords(self, *a):
        return []
    def itemconfig(self, *a, **kw):
        pass
    itemconfigure = itemconfig


class Menu(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.entries = []
    def add_command(self, **kw):
        self.entries.append(('command', kw))
    def add_cascade(self, **kw):
        self.entries.append(('cascade', kw))
    def add_separator(self, **kw):
        self.entries.append(('separator', kw))
    def invoke_entry(self, label):
        for kind, kw in self.entries:
            if kw.get('label') == label and kw.get('command'):
                return kw['command']()


class Message(Widget):
    pass


class OptionMenu(Widget):
    def __init__(self, master, variable, value=None, *values, **kw):
        super().__init__(master, **kw)


# --- constants -------------------------------------------------------------------

END = 'end'
ALL = 'all'
INSERT = 'insert'
LEFT, RIGHT, TOP, BOTTOM = 'left', 'right', 'top', 'bottom'
BOTH, X, Y, NONE = 'both', 'x', 'y', 'none'
N, S, E, W = 'n', 's', 'e', 'w'
NW, NE, SW, SE, NS, EW, NSEW = 'nw', 'ne', 'sw', 'se', 'ns', 'ew', 'nsew'
CENTER = 'center'
NORMAL, DISABLED, ACTIVE = 'normal', 'disabled', 'active'
HORIZONTAL, VERTICAL = 'horizontal', 'vertical'
SINGLE, BROWSE, MULTIPLE, EXTENDED = 'single', 'browse', 'multiple', \
    'extended'
WORD, CHAR = 'word', 'char'
TRUE, FALSE = True, False


class TclError(Exception):
    pass


# --- submodules --------------------------------------------------------------------

class _Font:
    def __init__(self, root=None, font=None, name=None, exists=False, **kw):
        self.options = dict(kw)
    def configure(self, **kw):
        self.options.update(kw)
    config = configure
    def actual(self, option=None):
        return self.options if option is None else self.options.get(option)
    def cget(self, option):
        return self.options.get(option)
    def measure(self, text):
        return 8 * len(str(text))
    def metrics(self, *options):
        values = dict(ascent=10, descent=3, linespace=14, fixed=1)
        if len(options) == 1:
            return values[options[0]]
        return values
    def copy(self):
        return _Font(**self.options)


font = types.ModuleType('tkinter.font')
font.Font = _Font
font.BOLD = 'bold'
font.NORMAL = 'normal'
font.ITALIC = 'italic'
font.nametofont = lambda name, root=None: _Font()
font.families = lambda root=None: ('Courier New', 'Helvetica')


def _dialog_unset(*a, **kw):
    raise AssertionError(
        'faketk: monkeypatch tkinter.filedialog for this test')


filedialog = types.ModuleType('tkinter.filedialog')
filedialog.askopenfilename = _dialog_unset
filedialog.askopenfilenames = _dialog_unset
filedialog.asksaveasfile = _dialog_unset
filedialog.asksaveasfilename = _dialog_unset
filedialog.askdirectory = _dialog_unset


class _MessageBox(types.ModuleType):
    def __init__(self):
        super().__init__('tkinter.messagebox')
        self.calls = []
    def _record(self, kind, *args, **kw):
        self.calls.append((kind, args, kw))
        return True
    def showerror(self, *a, **kw):
        return self._record('showerror', *a, **kw)
    def showinfo(self, *a, **kw):
        return self._record('showinfo', *a, **kw)
    def showwarning(self, *a, **kw):
        return self._record('showwarning', *a, **kw)
    def askyesno(self, *a, **kw):
        return self._record('askyesno', *a, **kw)
    def askokcancel(self, *a, **kw):
        return self._record('askokcancel', *a, **kw)


messagebox = _MessageBox()


def _build_module():
    mod = types.ModuleType('tkinter')
    for name, value in globals().items():
        if name.startswith('_'):
            continue
        setattr(mod, name, value)
    mod.font = font
    mod.filedialog = filedialog
    mod.messagebox = messagebox
    mod.TclError = TclError
    return mod


GUI_MODULES = [
    'kvarq_tpu.gui.util', 'kvarq_tpu.gui.settings', 'kvarq_tpu.gui.tkplot',
    'kvarq_tpu.gui.explorer', 'kvarq_tpu.gui.simple', 'kvarq_tpu.gui.main',
]


@contextlib.contextmanager
def installed():
    ''' swap the fake into sys.modules and re-import the GUI modules
        against it; restores the real tkinter (and re-imports the GUI
        modules) on exit '''
    saved = {name: sys.modules.get(name) for name in
             ('tkinter', 'tkinter.font', 'tkinter.filedialog',
              'tkinter.messagebox')}
    mod = _build_module()
    sys.modules['tkinter'] = mod
    sys.modules['tkinter.font'] = font
    sys.modules['tkinter.filedialog'] = filedialog
    sys.modules['tkinter.messagebox'] = messagebox
    reset()
    try:
        for name in GUI_MODULES:
            if name in sys.modules:
                importlib.reload(sys.modules[name])
            else:
                importlib.import_module(name)
        yield mod
    finally:
        for name, module in saved.items():
            if module is not None:
                sys.modules[name] = module
            else:
                sys.modules.pop(name, None)
        for name in GUI_MODULES:
            if name in sys.modules:
                importlib.reload(sys.modules[name])
