"""In-circuit algebra gadgets: extension-field towers and short
Weierstrass curve operations over 2-chain inner curves
(reference std/algebra/{fields_bls12377, sw_bls12377}).
"""
