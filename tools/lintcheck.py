#!/usr/bin/env python
"""Lightweight AST lint rules (stdlib-only).

Counterpart of the reference's go-ruleguard rule pack (rules/*.go,
SURVEY.md component 22): a small set of project-specific bug-pattern
checks run by ``make lint`` and CI.

Rules:
  R001 mutable default argument (list/dict/set literal)
  R002 bare ``except:`` clause
  R003 ``== True`` / ``== False`` / ``== None`` comparisons
  R004 f-string in an exception-free ``assert`` without message is fine,
       but ``assert`` with a side-effecting call (assert x.pop()) is flagged
  R005 shadowing a builtin with a module-level assignment
  R006 float equality comparison with a literal (use math.isclose/pytest.approx)
       — skipped inside tests (approx is used there)
  R007 TODO/FIXME without context text
"""

from __future__ import annotations

import ast
import pathlib
import sys

BUILTINS = {"list", "dict", "set", "str", "int", "float", "type", "id",
            "input", "max", "min", "sum", "all", "any", "len"}

SIDE_EFFECT_CALLS = {"pop", "remove", "append", "add", "update", "write"}


class Checker(ast.NodeVisitor):
    def __init__(self, path: pathlib.Path, is_test: bool):
        self.path = path
        self.is_test = is_test
        self.problems: list[tuple[int, str, str]] = []

    def report(self, node, rule, msg):
        self.problems.append((node.lineno, rule, msg))

    def visit_FunctionDef(self, node):
        for default in node.args.defaults + node.args.kw_defaults:
            if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                self.report(default, "R001",
                            f"mutable default argument in {node.name}()")
        self.generic_visit(node)

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.report(node, "R002", "bare except: clause")
        self.generic_visit(node)

    def visit_Compare(self, node):
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)):
                if isinstance(comp, ast.Constant) and (
                        comp.value is True or comp.value is False
                        or comp.value is None):
                    self.report(node, "R003",
                                f"comparison with literal {comp.value!r}; "
                                "use is/is not or truthiness")
                if (not self.is_test and isinstance(comp, ast.Constant)
                        and isinstance(comp.value, float)
                        and comp.value not in (0.0, 1.0, -1.0, 0.5, 2.0)):
                    self.report(node, "R006",
                                f"float equality with {comp.value}; use "
                                "math.isclose")
        self.generic_visit(node)

    def visit_Assert(self, node):
        for sub in ast.walk(node.test):
            if (isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Attribute)
                    and sub.func.attr in SIDE_EFFECT_CALLS):
                self.report(node, "R004",
                            f"assert with side-effecting call .{sub.func.attr}()")
        self.generic_visit(node)

    def visit_Assign(self, node):
        if isinstance(getattr(node, "parent", None), ast.Module):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id in BUILTINS:
                    self.report(node, "R005",
                                f"module-level shadowing of builtin {tgt.id!r}")
        self.generic_visit(node)


def add_parents(tree):
    for node in ast.walk(tree):
        for child in ast.iter_child_nodes(node):
            child.parent = node


def check_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: SYNTAX {e.msg}"]
    add_parents(tree)
    is_test = "tests" in path.parts or path.name.startswith("test_")
    checker = Checker(path, is_test)
    checker.visit(tree)
    out = [f"{path}:{line}: {rule} {msg}"
           for line, rule, msg in checker.problems]
    for i, line in enumerate(src.splitlines(), 1):
        stripped = line.strip()
        if stripped in ("# TODO", "# FIXME"):
            out.append(f"{path}:{i}: R007 TODO/FIXME without context")
    return out


def main() -> int:
    targets = sys.argv[1:] or ["go_audio_resampler_tpu"]
    problems = []
    for target in targets:
        p = pathlib.Path(target)
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            problems.extend(check_file(f))
    for line in problems:
        print(line)
    print(f"lintcheck: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
