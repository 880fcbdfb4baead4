"""AST sweep: compare the reference package's public API against ours.

Walks every module of `/root/reference/src/fast_forward` (read-only
upstream) and `fastforward_tpu`, collects public classes, their public
methods/properties/dunders, module-level functions, and every
constructor/method parameter name, then reports anything the reference
exposes that this package does not. PARITY.md is the human-readable
companion; this script is the checkable source of its "no missing
symbols, no missing parameters" claim.

Usage: python scripts/parity_sweep.py [--reference /root/reference/src/fast_forward]
Exit code 0 = full parity; 1 = something is missing.
"""

import argparse
import ast
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

DUNDERS = {
    "__init__", "__call__", "__len__", "__getitem__", "__eq__", "__repr__",
    "__contains__", "__iter__", "__add__", "__mul__",
}

# reference symbols that are intentionally NOT mirrored one-to-one;
# each maps to where the capability lives here
ALIASES = {
    "NanoPQ": "fastforward_tpu.quantizer.pq.PQ (alias NanoPQ)",
    "NanoOPQ": "fastforward_tpu.quantizer.pq.OPQ (alias NanoOPQ)",
}


def collect(root: str):
    """-> {class_or_func_name: {"methods": {name: [params]}, "params": [...]}}"""
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            tree = ast.parse(open(os.path.join(dirpath, f)).read())
            for node in tree.body:
                if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
                    methods = {}
                    for n in node.body:
                        if isinstance(n, ast.FunctionDef) and (
                            not n.name.startswith("_") or n.name in DUNDERS
                        ):
                            params = [a.arg for a in n.args.args[1:]] + [
                                a.arg for a in n.args.kwonlyargs
                            ]
                            methods.setdefault(n.name, params)
                    out[node.name] = methods
                elif isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                    params = [a.arg for a in node.args.args] + [
                        a.arg for a in node.args.kwonlyargs
                    ]
                    out[node.name] = {"": params}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--reference", default="/root/reference/src/fast_forward"
    )
    args = ap.parse_args()
    here = Path(__file__).parent.parent / "fastforward_tpu"

    ref = collect(args.reference)
    ours = collect(str(here))
    # aliases are plain assignments (NanoPQ = PQ) the AST class walk skips;
    # resolve them by import so renamed aliases fail the sweep
    import fastforward_tpu.quantizer as q  # noqa: F401

    for name in list(ALIASES):
        target = getattr(q, name, None)
        if target is not None and target.__name__ in ours:
            ours[name] = ours[target.__name__]

    missing = []
    for name, methods in sorted(ref.items()):
        if name not in ours:
            missing.append(f"symbol {name}")
            continue
        for m, params in methods.items():
            label = f"{name}.{m}" if m else f"{name}()"
            om = ours[name]
            if m not in om and m != "":
                missing.append(f"method {label}")
                continue
            lost = [p for p in params if p not in om.get(m, params)]
            if lost:
                missing.append(f"params {label}: {lost}")

    if missing:
        print("MISSING vs reference:")
        for m in missing:
            print(" -", m)
        return 1
    n_methods = sum(len(m) for m in ref.values())
    print(
        f"full parity: {len(ref)} public symbols, {n_methods} "
        "methods/functions, all parameters present"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
