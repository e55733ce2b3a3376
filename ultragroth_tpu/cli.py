"""CLI twins of the reference binaries.

Reference argv contracts:
  prover             <circuit.zkey> <witness.wtns> <proof.json> <public.json>
                     (src/main_prover.cpp:21)
  prover_ultra_groth <circuit.zkey> <witness.uwtns> <proof.json> <public.json>
                     (src/main_prover_ultra_groth.cpp:21)
  verifier           <verification_key.json> <inputs.json> <proof.json>
                     (src/main_verifier.cpp:12; exit code == validity,
                      prints "Result: Valid proof" / "Result: Invalid proof")

Usage here:  python -m ultragroth_tpu.cli <prove|prove-ultra|verify|
verify-ultra> <args...>, plus `setup`/`setup-ultra` extras for generating
synthetic zkeys (no reference equivalent; snarkjs fills that role upstream).
"""
from __future__ import annotations

import argparse
import sys


def _cmd_prove(args, ultra: bool):
    from . import api
    cls = api.UltraGrothProver if ultra else api.Groth16Prover
    devices = None if args.devices in (None, "1") else args.devices
    try:
        prover = cls.from_file(args.zkey, backend=args.backend,
                               devices=devices)
        proof_json, public_json = prover.prove(open(args.wtns, "rb").read())
    except api.ProverError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    with open(args.proof, "w") as f:
        f.write(proof_json)
    with open(args.public, "w") as f:
        f.write(public_json)
    return 0


def _cmd_verify(args, ultra: bool):
    from . import api
    fn = api.ultra_groth_verify if ultra else api.groth16_verify
    code = fn(open(args.proof).read(), open(args.inputs).read(),
              open(args.vk).read())
    if code == api.VERIFIER_VALID_PROOF:
        print("Result: Valid proof", file=sys.stderr)
        return 0
    if code == api.VERIFIER_INVALID_PROOF:
        print("Result: Invalid proof", file=sys.stderr)
        return 1
    print("Error: invalid proof/inputs/key data", file=sys.stderr)
    return 1


def _cmd_setup(args):
    """Generate a synthetic Groth16 zkey + vk (square-chain circuit)."""
    import json
    from .testkit.circuits import square_chain_circuit
    from .testkit.setup import groth16_setup
    from .io.binfile import pack_binfile
    from . import constants as C
    from .constants import FR_MODULUS as R
    r1cs, wtns = square_chain_circuit(args.constraints, seed=args.seed)
    res = groth16_setup(r1cs, seed=args.seed)
    open(args.zkey, "wb").write(res.zkey_bytes)
    if args.vk:
        json.dump(res.vk_json, open(args.vk, "w"))
    if args.wtns:
        sec1 = ((32).to_bytes(4, "little") + R.to_bytes(32, "little")
                + r1cs.n_vars.to_bytes(4, "little"))
        open(args.wtns, "wb").write(pack_binfile(
            C.WTNS_MAGIC, 2, [(1, sec1), (2, wtns.tobytes())]))
    print(f"wrote {args.zkey}: nVars={r1cs.n_vars} rows={len(r1cs.rows)}")
    return 0


def _cmd_setup_ultra(args):
    """Generate a synthetic UltraGroth zkey + vk + uwtns (lookup circuit)."""
    import json
    import random
    from .testkit.circuits import LookupCircuit
    from .testkit.setup import ultragroth_setup
    rng = random.Random(args.seed)
    chunks = [rng.randrange(args.table_size) for _ in range(args.chunks)]
    circ = LookupCircuit(chunks, args.table_size)
    res = ultragroth_setup(circ.r1cs, circ.round_indexes, circ.final_indexes,
                           circ.rand_indx, seed=args.seed)
    open(args.zkey, "wb").write(res.zkey_bytes)
    if args.vk:
        json.dump(res.vk_json, open(args.vk, "w"))
    if args.uwtns:
        open(args.uwtns, "wb").write(circ.uwtns_bytes())
    print(f"wrote {args.zkey}: nVars={circ.r1cs.n_vars} "
          f"chunks={args.chunks} table={args.table_size}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ultragroth_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name, ultra in (("prove", False), ("prove-ultra", True)):
        p = sub.add_parser(name)
        p.add_argument("zkey")
        p.add_argument("wtns")
        p.add_argument("proof")
        p.add_argument("public")
        p.add_argument("--backend", default="jax",
                       choices=["jax", "oracle"])
        p.add_argument("--devices", default=None,
                       help="shard the prove over N chips ('all' = every "
                            "visible device); default single-device")
        p.set_defaults(fn=lambda a, u=ultra: _cmd_prove(a, u))

    for name, ultra in (("verify", False), ("verify-ultra", True)):
        p = sub.add_parser(name)
        p.add_argument("vk")
        p.add_argument("inputs")
        p.add_argument("proof")
        p.set_defaults(fn=lambda a, u=ultra: _cmd_verify(a, u))

    p = sub.add_parser("setup")
    p.add_argument("zkey")
    p.add_argument("--vk", default=None)
    p.add_argument("--wtns", default=None)
    p.add_argument("--constraints", type=int, default=1 << 10)
    p.add_argument("--seed", type=int, default=1)
    p.set_defaults(fn=_cmd_setup)

    p = sub.add_parser("setup-ultra")
    p.add_argument("zkey")
    p.add_argument("--vk", default=None)
    p.add_argument("--uwtns", default=None)
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--table-size", type=int, default=4)
    p.add_argument("--seed", type=int, default=1)
    p.set_defaults(fn=_cmd_setup_ultra)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
