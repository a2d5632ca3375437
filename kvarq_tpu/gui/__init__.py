'''
Tkinter GUI clients (reference kvarq/gui/): launcher with live log pane,
scan wizard, result explorers and canvas plot windows.
'''


def lift_window(win):
    ''' raise a window above others (reference gui/__init__.py:6-12) '''
    win.lift()
    win.call('wm', 'attributes', '.', '-topmost', True)

    def after_lift():
        win.call('wm', 'attributes', '.', '-topmost', False)
    win.after_idle(after_lift)
