"""C ABI shim: native header + embed bridge (see rt64_tpu.h)."""
