#!/usr/bin/env python3
"""Proof-server client example: twin of /root/reference/tools/request.js.

POSTs an input (or a prebuilt .wtns) to /input/<circuit>, then polls
/status until the prover leaves the busy state and prints the result.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("circuit")
    ap.add_argument("input", help="input JSON file, or a .wtns when --wtns")
    ap.add_argument("--server", default="http://127.0.0.1:9080")
    ap.add_argument("--wtns", action="store_true",
                    help="POST a prebuilt witness instead of circuit input")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args(argv)

    body = open(args.input, "rb").read()
    ctype = "application/octet-stream" if args.wtns else "application/json"
    req = urllib.request.Request(
        f"{args.server}/input/{args.circuit}", data=body,
        headers={"Content-Type": ctype})
    urllib.request.urlopen(req)

    deadline = time.time() + args.timeout
    while time.time() < deadline:
        st = json.load(urllib.request.urlopen(f"{args.server}/status"))
        if st["status"] not in ("busy", "ready"):
            print(json.dumps(st, indent=2))
            return 0 if st["status"] == "success" else 1
        time.sleep(0.25)
    print("timeout waiting for prover", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
