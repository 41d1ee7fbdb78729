"""Bounded TPU-tunnel health probe.

A wedged axon relay blocks a client's first device op forever (see
bench.py:_preflight_device). This probe runs the device op in a
subprocess with a hard bound and prints exactly one line:
``TUNNEL_HEALTHY`` or ``TUNNEL_WEDGED <detail>``. Exit code 0/1.

Usage: python scripts/probe_tunnel.py [timeout_s]
"""
import subprocess
import sys

timeout_s = int(sys.argv[1]) if len(sys.argv) > 1 else 150

try:
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp;"
         "print(float(jnp.ones((2,2)).sum()), jax.devices()[0].platform)"],
        capture_output=True, timeout=timeout_s, text=True,
    )
    if proc.returncode == 0 and "4.0" in proc.stdout:
        print("TUNNEL_HEALTHY", proc.stdout.strip())
        raise SystemExit(0)
    detail = (proc.stderr or proc.stdout).strip()[-200:]
except subprocess.TimeoutExpired:
    detail = f"device probe hung >{timeout_s}s"
print("TUNNEL_WEDGED", detail)
raise SystemExit(1)
