#!/usr/bin/env python
"""Generate doc/api-index.md: one line per public name in the package.

Run from the repo root:  python scripts/gen_api_index.py
(tests/test_api_index.py fails if the committed index is stale.)
"""

import ast
import io
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def render() -> str:
    out = io.StringIO()
    print("# API index", file=out)
    print(file=out)
    print("One line per public name; see docstrings (each cites the reference", file=out)
    print("implementation by `file:line`) for details.  Generated —", file=out)
    print("regenerate with `python scripts/gen_api_index.py`.", file=out)
    print(file=out)
    for f in sorted((ROOT / "katsdpsigproc_tpu").rglob("*.py")):
        tree = ast.parse(f.read_text())
        rows = []
        for n in tree.body:
            if isinstance(n, (ast.FunctionDef, ast.ClassDef)) and not n.name.startswith("_"):
                doc = (ast.get_docstring(n) or "").strip().splitlines()
                first = doc[0].rstrip() if doc else ""
                kind = "class" if isinstance(n, ast.ClassDef) else "def"
                rows.append(f"- `{kind} {n.name}` — {first}".rstrip(" —"))
        if rows:
            rel = f.relative_to(ROOT)
            mod = str(rel).replace("/", ".").removesuffix(".py").removesuffix(".__init__")
            print(f"## `{mod}`", file=out)
            print(file=out)
            print("\n".join(rows), file=out)
            print(file=out)
    return out.getvalue()


def main():
    target = ROOT / "doc" / "api-index.md"
    text = render()
    if "--check" in sys.argv:
        if target.read_text() != text:
            print("doc/api-index.md is stale — run python scripts/gen_api_index.py",
                  file=sys.stderr)
            raise SystemExit(1)
        print("api-index up to date", file=sys.stderr)
        return
    target.write_text(text)
    print(f"wrote {target}", file=sys.stderr)


if __name__ == "__main__":
    main()
