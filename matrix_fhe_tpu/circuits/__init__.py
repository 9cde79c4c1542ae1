"""Homomorphic circuits (counterpart of /root/reference/circuits/)."""
