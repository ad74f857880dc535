"""Move CPU executables out of the committed TPU compile cache.

The committed .jax_cache must hold ONLY TPU executables: CPU AOT entries are
compiled against the build host's exact CPU features and other machines
reject them with loader errors (or worse, SIGILL) — see VALIDATION.md
round-4 "Persistent-compile-cache findings". Real bench runs still write a
few CPU entries (the product paths pin their host-prep jits to the CPU
backend), so run this before committing the cache:

    python scripts/prune_cpu_cache_entries.py          # move CPU -> .jax_cache_cpu
    python scripts/prune_cpu_cache_entries.py --list   # classify only

End-of-round cache refresh protocol (VALIDATION.md): final code commit
first, one full `python bench.py` run to repopulate, THEN prune + commit
.jax_cache with no further source edits (cache keys shift with line numbers,
and bench children pin PYTHONHASHSEED=0 because randomized hashing perturbs
HLO serialization into fresh keys).
"""
import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, ".jax_cache")
DST = os.path.join(REPO, ".jax_cache_cpu")

_CPU_MARKERS = (b"prefer-no-scatter", b"CpuExecutable", b"x86_64")
_TPU_MARKERS = (b"mosaic", b"tpu", b"TPU")


def _blob(path):
    with open(path, "rb") as f:
        data = f.read()
    try:
        import zstandard as zstd

        return zstd.ZstdDecompressor().decompress(
            data, max_output_size=256 * 1024 * 1024)
    except Exception:
        return data


def classify(path):
    b = _blob(path)
    if any(b.find(m) >= 0 for m in _CPU_MARKERS):
        return "cpu"
    if any(b.find(m) >= 0 for m in _TPU_MARKERS):
        return "tpu"
    return "unknown"


def main():
    list_only = "--list" in sys.argv
    os.makedirs(DST, exist_ok=True)
    moved, kept, unknown = 0, 0, 0
    for p in sorted(glob.glob(os.path.join(SRC, "*-cache"))):
        kind = classify(p)
        if kind == "cpu":
            moved += 1
            print(f"cpu  {os.path.basename(p)}")
            if not list_only:
                shutil.move(p, os.path.join(DST, os.path.basename(p)))
        elif kind == "tpu":
            kept += 1
        else:
            unknown += 1
            print(f"???  {os.path.basename(p)} (left in place)")
    print(f"{'would move' if list_only else 'moved'} {moved} cpu entries; "
          f"kept {kept} tpu; {unknown} unknown")


if __name__ == "__main__":
    main()
