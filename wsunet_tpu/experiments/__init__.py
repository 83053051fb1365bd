"""Archived performance experiments — correct but not on the shipping path.

Modules here are kept runnable (interpret-mode tests in tests/, TPU
parity tests gated behind WSUNET_TPU_TESTS=1) so their measured evidence
stays reproducible, but nothing in the library dispatches to them.
"""
