"""Pre-warm the driver's entry() program on the ambient backend.

The driver compile-checks ``__graft_entry__.entry()`` single-chip at round
end; on the axon TPU a cold remote compile takes 6-40+ min, so every round
must re-populate the persistent compilation cache (bench.py sets it at
``/root/.cache/jax_comp``) by running the EXACT driver program first.
Queue slot: ``python tools/warm_entry.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import __graft_entry__  # noqa: E402


def main() -> None:
    t0 = time.time()
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    # Force a host transfer: block_until_ready is unreliable on axon.
    leaf = float(jax.numpy.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"entry ok, first-leaf sum {leaf} wall {time.time() - t0}")


if __name__ == "__main__":
    main()
