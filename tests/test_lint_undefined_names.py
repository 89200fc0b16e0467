"""Static undefined-name lint over the package and top-level scripts.

Motivated by a real escape: bench.py kept an ``if prewarm:`` block after
the ``prewarm`` parameter was removed — a NameError on every run that no
unit test caught (the workload builder is too heavy to execute on CPU).
No linter ships in this environment, so this test does the one check
that matters with stdlib ``symtable``: every name *loaded* in any scope
must resolve to a local, parameter, enclosing-scope binding, module
global, import, or builtin. Pure text analysis — no JAX, runs in ms.
"""
import builtins
import symtable
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

FILES = sorted(
    list((REPO / 'red_diffeq_tpu').rglob('*.py'))
    + list((REPO / 'tools').glob('*.py'))
    + list((REPO / 'examples').glob('*.py'))
    + [REPO / 'bench.py', REPO / '__graft_entry__.py']
)

BUILTINS = set(dir(builtins)) | {'__file__', '__name__', '__doc__',
                                 '__package__', '__spec__', '__loader__',
                                 '__builtins__', '__debug__',
                                 # implicit closure cell for zero-arg super()
                                 '__class__'}


def _scope_defined(table):
    """Names bound in this scope: assignments, imports, params, and
    nested function/class names."""
    defined = set()
    for s in table.get_symbols():
        if (s.is_assigned() or s.is_imported() or s.is_parameter()
                or s.is_namespace()):
            defined.add(s.get_name())
    for child in table.get_children():
        defined.add(child.get_name())
    return defined


def _walk(table, enclosing, module_names, problems, path):
    defined = _scope_defined(table)
    visible = enclosing | defined | module_names | BUILTINS
    is_class = table.get_type() == 'class'
    for s in table.get_symbols():
        name = s.get_name()
        if not s.is_referenced():
            continue
        if name in visible:
            continue
        if s.is_global() and name in module_names:
            continue
        problems.append(f'{path}: undefined name {name!r} in scope '
                        f'{table.get_name()!r}')
    for child in table.get_children():
        # Class bodies do not contribute to the lexical scope of the
        # methods they contain.
        _walk(child, enclosing if is_class else (enclosing | defined),
              module_names, problems, path)


def test_no_undefined_names():
    problems = []
    for f in FILES:
        src = f.read_text()
        try:
            top = symtable.symtable(src, str(f), 'exec')
        except SyntaxError as e:
            problems.append(f'{f}: syntax error: {e}')
            continue
        module_names = _scope_defined(top)
        rel = f.relative_to(REPO)
        for child in top.get_children():
            _walk(child, set(), module_names, problems, rel)
        # Module top-level loads
        for s in top.get_symbols():
            if (s.is_referenced() and not (s.is_assigned() or s.is_imported()
                                           or s.is_namespace())
                    and s.get_name() not in BUILTINS
                    and s.get_name() not in module_names):
                problems.append(f'{rel}: undefined module-level name '
                                f'{s.get_name()!r}')
    assert not problems, '\n'.join(problems)
