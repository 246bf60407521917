import numpy as np


def nextpow2(n):
    """Smallest integer e with 2**e >= n. reference: MBExWN_NVoc/utils/math_utils.py:8-17"""
    return int(np.ceil(np.log2(n)))


def nextpow2_val(n):
    """Smallest power of two >= n. reference: MBExWN_NVoc/utils/math_utils.py:19-31"""
    v = 2
    while v < n:
        v *= 2
    return v
