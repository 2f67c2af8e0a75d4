"""Continuous-batching control plane (host-side Python).

Mirrors the reference's ``src/engine/`` module split
(``/root/reference/src/engine/mod.rs:1-4``): llm_engine / scheduler /
block_manager / sequence. The control plane is deliberately host-side and
single-threaded per process — same as the reference's ``Rc<RefCell<...>>``
design (``llm_engine.rs:1-3``) — while all compute stays on device behind the
jitted model runner.
"""
