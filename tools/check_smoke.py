"""CI guard: the smoke subset must finish in under 60 s (pytest.ini promise).

Run: python tools/check_smoke.py  — exits nonzero if the subset is slow or red.
"""

import subprocess
import sys
import time

LIMIT_S = 60.0


def main():
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "-m", "smoke", "-q", "--no-header"],
        capture_output=True, text=True)
    wall = time.time() - t0
    tail = "\n".join(p.stdout.splitlines()[-3:])
    print(f"smoke subset: {wall:.1f}s (limit {LIMIT_S:.0f}s)\n{tail}")
    if p.returncode != 0:
        print("FAIL: smoke subset is red", file=sys.stderr)
        return 1
    if wall > LIMIT_S:
        print(f"FAIL: smoke subset took {wall:.1f}s > {LIMIT_S:.0f}s",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
