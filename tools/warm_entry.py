"""Warm the persistent compile cache for the driver's entry()/bench runs."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import __graft_entry__
fn, args = __graft_entry__.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry warmed:", [getattr(o, "shape", None) for o in out])
