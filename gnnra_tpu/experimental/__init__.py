"""Experimental kernels/layouts WITHOUT a demonstrated winning regime.

Code here is correct (oracle-tested) but lost its performance bake-offs;
it is kept for reference and future revisiting, NOT as supported surface.
See docs/RESULTS.md for the measurements that demoted each entry.
"""
