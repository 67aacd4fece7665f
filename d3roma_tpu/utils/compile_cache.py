"""Machine-keyed persistent XLA compile-cache directories.

The JAX persistent compilation cache keys entries by program + compile
options, NOT by the host CPU's feature set — an XLA:CPU AOT executable
compiled on a host with e.g. AMX/prefer-no-gather fails to *load* on a
host without them (``cpu_aot_loader.cc`` "machine feature mismatch"
errors, observed when `.jax_bench_cache` was shared across machines:
every cold run paid a load-attempt-and-error per entry). Keying the
cache directory by a host fingerprint makes cross-machine entries
invisible instead of poisonous.

Import-light on purpose (os/hashlib/platform only): callers set
``JAX_COMPILATION_CACHE_DIR`` before any backend initialization.
"""

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable id of this host's ISA surface (arch + CPU flags) AND
    the jax/jaxlib version pair. The version matters as much as the CPU:
    XLA:CPU AOT entries embed compiler-chosen target features (e.g.
    ``prefer-no-gather``) that a different XLA build does not accept —
    the round-4 driver artifact showed entries failing to LOAD with
    "machine feature mismatch" spam on the very host that wrote them,
    which is version skew, not CPU skew. importlib.metadata keeps this
    import-light (callers must set JAX_COMPILATION_CACHE_DIR before jax
    imports)."""
    bits = [platform.system(), platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 "flags", aarch64 "Features" — first core is enough
                if line.startswith(("flags", "Features")):
                    bits.append(line.split(":", 1)[-1].strip())
                    break
    except OSError:
        pass
    try:
        from importlib.metadata import version

        bits += [version("jax"), version("jaxlib")]
    except Exception:  # noqa: BLE001 — versionless envs still get keyed
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def machine_cache_dir(base: str) -> str:
    """``base/mc_<fingerprint>``, created; legacy un-keyed cache files at
    the base root (written before keying existed, possibly by another
    machine) are purged so a cold run never attempts to load them."""
    keyed = os.path.join(base, "mc_" + machine_fingerprint())
    os.makedirs(keyed, exist_ok=True)
    # purge once per base dir, behind a marker: repeated calls (and valid
    # same-machine pre-keying entries) must not pay a full purge each time
    marker = os.path.join(base, ".legacy_purged")
    if not os.path.exists(marker):
        try:
            names = os.listdir(base)
        except OSError:
            names = []
        for name in names:
            path = os.path.join(base, name)
            try:
                if os.path.isfile(path):
                    os.remove(path)
            except OSError:
                # a concurrent process may have removed it already; keep
                # purging the rest instead of aborting the loop
                continue
        try:
            with open(marker, "w"):
                pass
        except OSError:
            pass
    return keyed
