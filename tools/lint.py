"""First-party lint gate (reference gates mypy+black+ruff, `tasks.py:77-96`).

This image ships no lint tools and installs are not allowed, so `make
lint` runs this AST-based checker; when ruff is importable (normal dev
environments — config lives in pyproject.toml) it runs ruff as well.

Checks:
- syntax (ast.parse over every file)
- unused imports (module scope; `__init__.py` re-exports and
  ``# noqa``-tagged lines exempt)
- bare ``except:``
- mutable default arguments (list/dict/set literals)
- tabs in indentation
- f-strings without placeholders
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
TARGETS = ["dalm_tpu", "tests", "tools", "bench.py", "bench_index.py", "__graft_entry__.py"]


def _noqa_lines(src: str) -> set[int]:
    return {i + 1 for i, line in enumerate(src.splitlines()) if "# noqa" in line}


class Visitor(ast.NodeVisitor):
    def __init__(self, path: pathlib.Path, src: str):
        self.path = path
        self.noqa = _noqa_lines(src)
        self.problems: list[str] = []
        self.imports: dict[str, int] = {}  # name -> lineno
        self.used: set[str] = set()
        self.is_init = path.name == "__init__.py"

    def problem(self, node, msg):
        if getattr(node, "lineno", 0) in self.noqa:
            return
        self.problems.append(f"{self.path}:{node.lineno}: {msg}")

    # -- imports ----------------------------------------------------------
    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imports.setdefault(name, node.lineno)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imports.setdefault(a.asname or a.name, node.lineno)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    # -- checks -----------------------------------------------------------
    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.problem(node, "bare except")
        self.generic_visit(node)

    def visit_FunctionDef(self, node):
        self._check_defaults(node)
        self.generic_visit(node)

    visit_AsyncFunctionDef = visit_FunctionDef

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [d for d in node.args.kw_defaults if d]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.problem(d, "mutable default argument")

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.problem(node, "f-string without placeholders")
        self.generic_visit(node)

    def visit_FormattedValue(self, node):
        # Skip format_spec (itself a JoinedStr of constants, e.g. ":.4f").
        self.visit(node.value)

    def finish(self, src: str):
        if not self.is_init:
            # names used anywhere, incl. inside strings for __all__ style
            for name, lineno in self.imports.items():
                if name in self.used or name == "annotations":
                    continue
                if f'"{name}"' in src or f"'{name}'" in src:
                    continue
                if lineno in self.noqa:
                    continue
                self.problems.append(f"{self.path}:{lineno}: unused import '{name}'")
        for i, line in enumerate(src.splitlines(), 1):
            if line.startswith("\t") and i not in self.noqa:
                self.problems.append(f"{self.path}:{i}: tab indentation")
        return self.problems


def lint_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    v = Visitor(path, src)
    v.visit(tree)
    return v.finish(src)


def main() -> int:
    problems: list[str] = []
    n = 0
    for target in TARGETS:
        p = ROOT / target
        files = [p] if p.suffix == ".py" else sorted(p.rglob("*.py"))
        for f in files:
            n += 1
            problems.extend(lint_file(f))
    for msg in problems:
        print(msg)
    print(f"lint: {n} files, {len(problems)} problems")

    # Run ruff too when available (not in this image; config in pyproject).
    try:
        import ruff  # noqa: F401  # type: ignore

        import subprocess

        rc = subprocess.call([sys.executable, "-m", "ruff", "check", str(ROOT)])
        if rc != 0:
            return rc
    except ImportError:
        pass
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
