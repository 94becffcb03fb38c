#!/usr/bin/env python
"""Zero-dependency lint for this repo (stdlib only).

The reference's only CI is static hygiene — Pyright + isort on push/PR
(reference .github/workflows/lint.yml:1-37). This environment has no
pyright/ruff/isort installed and no network, so this script implements the
load-bearing subset with the stdlib, and .github/workflows/lint.yml runs the
real ruff (configured in pyproject [tool.ruff]) where tools exist:

* syntax: every file must compile (py_compile semantics via compile());
* import order: one import block per file, grouped stdlib < third-party <
  first-party (viscoin_tpu), alphabetical within each group — the isort
  profile the reference enforces;
* unused imports: AST-based (names imported but never referenced; `# noqa`
  on the import line opts out — needed for the torch-after-importorskip
  pattern in tests);
* undefined exports: `__all__` entries that don't exist.

Usage: python scripts/lint.py [paths...]   (default: the repo's code)
Exit 0 = clean.
"""

from __future__ import annotations

import ast
import os
import sys

FIRST_PARTY = {"viscoin_tpu"}
# The repo's import convention (mirrored by [tool.ruff.lint.isort] /
# [tool.isort] in pyproject as a custom section): the JAX ecosystem is its
# own section AFTER other third-party imports — `import numpy as np` then
# the jax block is the dominant style of the codebase.
JAX_FAMILY = {"jax", "jaxlib", "flax", "optax", "orbax", "chex"}
# stdlib detection: sys.stdlib_module_names is exact for this interpreter
STDLIB = set(sys.stdlib_module_names)

DEFAULT_PATHS = ["viscoin_tpu", "tests", "scripts", "main.py", "bench.py",
                 "example.py", "__graft_entry__.py"]


def _group(mod: str) -> int:
    root = mod.split(".")[0]
    if root == "__future__":
        return -1
    if root in FIRST_PARTY or root == "tests":
        return 3
    if root in JAX_FAMILY:
        return 2
    if root in STDLIB:
        return 0
    return 1


def _iter_files(paths):
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                if "__pycache__" in root:
                    continue
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def _import_mod(node: ast.stmt) -> str | None:
    if isinstance(node, ast.Import):
        return node.names[0].name
    if isinstance(node, ast.ImportFrom):
        if node.level:  # relative import -> first-party by construction
            return "viscoin_tpu"
        return node.module or ""
    return None


def check_file(path: str) -> list[str]:
    errors: list[str] = []
    src = open(path, encoding="utf-8").read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    lines = src.splitlines()

    # ---- import order (top-level, before any other statement) ----
    head: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            head.append(node)
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # docstring
        elif isinstance(node, (ast.If, ast.Try)):
            continue  # conditional import blocks are exempt
        else:
            break
    seen: list[tuple[int, int, str, int]] = []
    for node in head:
        mod = _import_mod(node)
        if mod is None:
            continue
        line = lines[node.lineno - 1]
        # `# noqa: E402` (import-not-at-top, the conftest/main.py pattern)
        # does NOT exempt a line from ORDER checking — only a bare noqa or
        # an isort pragma does (ruff's I001 ignores E402 noqas the same way).
        noqa = "noqa" in line and not ("E402" in line and ":" in line)
        if noqa or "isort" in line:
            continue
        is_from = int(isinstance(node, ast.ImportFrom))
        seen.append((_group(mod), is_from, mod.lower(), node.lineno))
    for a, b in zip(seen, seen[1:]):
        if (a[0], a[1], a[2]) > (b[0], b[1], b[2]):
            errors.append(
                f"{path}:{b[3]}: import order: "
                f"{'from ' if b[1] else ''}{b[2]!r} (group {b[0]}) after "
                f"{'from ' if a[1] else ''}{a[2]!r} (group {a[0]}) — "
                "stdlib < third-party < first-party; within a group straight "
                "imports (alphabetical) then from-imports (alphabetical)")
            break  # one report per file keeps the output readable

    # ---- unused imports ----
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                continue
            line = lines[node.lineno - 1]
            if "noqa" in line:
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                name = (alias.asname or alias.name).split(".")[0]
                imported[name] = node.lineno
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # names referenced in __all__ strings count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant):
                                used.add(str(elt.value))
    is_pkg_init = path.endswith("__init__.py")
    for name, lineno in sorted(imported.items(), key=lambda kv: kv[1]):
        if name not in used and not is_pkg_init:
            errors.append(f"{path}:{lineno}: unused import: {name}")

    # ---- __all__ entries must exist ----
    defined = {n.name for n in ast.walk(tree)
               if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef))}
    defined |= {t.id for n in ast.walk(tree) if isinstance(n, ast.Assign)
                for t in n.targets if isinstance(t, ast.Name)}
    defined |= set(imported)
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__" and \
                        isinstance(node.value, (ast.List, ast.Tuple)):
                    for elt in node.value.elts:
                        if isinstance(elt, ast.Constant) and \
                                str(elt.value) not in defined:
                            errors.append(
                                f"{path}:{node.lineno}: __all__ names "
                                f"undefined symbol {elt.value!r}")
    return errors


def main(argv: list[str]) -> int:
    # Resolve user-supplied paths BEFORE the chdir (they are cwd-relative),
    # and refuse paths that don't exist — a typo must not report "0 files,
    # 0 problem(s)" and exit green.
    if argv:
        paths = [os.path.abspath(p) for p in argv]
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            print(f"lint: no such path(s): {missing}")
            return 2
    else:
        paths = DEFAULT_PATHS
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(here)
    all_errors: list[str] = []
    n = 0
    for f in _iter_files(paths):
        n += 1
        all_errors.extend(check_file(f))
    for e in all_errors:
        print(e)
    print(f"lint: {n} files, {len(all_errors)} problem(s)")
    return 1 if all_errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
