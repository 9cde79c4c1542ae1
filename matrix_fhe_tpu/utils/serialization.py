"""Binary serialization: the FHE analogue of checkpoint/resume.

Counterpart of the reference's WriteTo/ReadFrom/MarshalBinary subsystem over
utils/buffer (SURVEY.md section 5.4): every object (parameters, polynomials,
ciphertexts, keys, gadget ciphertexts, multiparty shares) serializes to a
compact binary format; parameters serialize as their literal and regenerate
all tables on load (ring/subring.go:334-417 semantics).

Format: a small JSON header (type tag + metadata + array manifest) length-
prefixed, followed by raw little-endian array payloads.  Deterministic and
versioned; fixed-vector regression tests pin the wire format
(TestRLWEConstSerialization pattern, core/rlwe/rlwe_test.go:41).
"""

from __future__ import annotations

import io
import json
import struct
from fractions import Fraction

import jax.numpy as jnp
import numpy as np

MAGIC = b"MFT1"  # matrix-fhe-tpu wire format v1


# ---------------------------------------------------------------------------
# Core writer/reader.
# ---------------------------------------------------------------------------

def _write_blob(w: io.BufferedIOBase, header: dict, arrays: list[np.ndarray]) -> int:
    manifest = [{"dtype": str(a.dtype), "shape": list(a.shape)} for a in arrays]
    head = json.dumps({"h": header, "m": manifest},
                      separators=(",", ":")).encode()
    n = w.write(MAGIC)
    n += w.write(struct.pack("<I", len(head)))
    n += w.write(head)
    for a in arrays:
        n += w.write(np.ascontiguousarray(a).tobytes())
    return n


def _read_blob(r: io.BufferedIOBase) -> tuple[dict, list[np.ndarray]]:
    magic = r.read(4)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    (hlen,) = struct.unpack("<I", r.read(4))
    meta = json.loads(r.read(hlen).decode())
    arrays = []
    for m in meta["m"]:
        dt = np.dtype(m["dtype"])
        count = int(np.prod(m["shape"])) if m["shape"] else 1
        buf = r.read(count * dt.itemsize)
        arrays.append(np.frombuffer(buf, dtype=dt).reshape(m["shape"]).copy())
    return meta["h"], arrays


def _frac(f: Fraction) -> list[str]:
    return [str(f.numerator), str(f.denominator)]


def _unfrac(v) -> Fraction:
    return Fraction(int(v[0]), int(v[1]))


# ---------------------------------------------------------------------------
# Object codecs.
# ---------------------------------------------------------------------------

def save(obj, w: io.BufferedIOBase | None = None) -> bytes | int:
    """Serialize any supported object; returns bytes if no writer given."""
    if w is None:
        buf = io.BytesIO()
        save(obj, buf)
        return buf.getvalue()

    from matrix_fhe_tpu.rgsw import RGSWCiphertext
    from matrix_fhe_tpu.rlwe.elements import Ciphertext, MetaData, Plaintext
    from matrix_fhe_tpu.rlwe import keys as K
    from matrix_fhe_tpu.rlwe.params import Parameters

    if isinstance(obj, Parameters):
        header = {"t": "params", "n": obj.n, "nth_root": obj.nth_root,
                  "q": [str(q) for q in obj.q], "p": [str(p) for p in obj.p],
                  "ring_type": obj.ring_type, "ntt_flag": obj.ntt_flag,
                  "default_scale": float(obj.default_scale),
                  "xe": [obj.xe.sigma, obj.xe.bound],
                  "xs": ([obj.xs.p, obj.xs.h] if hasattr(obj.xs, "p")
                         else [obj.xs.sigma, obj.xs.bound]),
                  "xs_kind": type(obj.xs).__name__}
        return _write_blob(w, header, [])

    if isinstance(obj, Plaintext):
        md = _metadata_dict(obj.metadata)
        return _write_blob(w, {"t": "pt", "md": md}, [np.asarray(obj.value)])

    if isinstance(obj, Ciphertext):
        md = _metadata_dict(obj.metadata)
        return _write_blob(w, {"t": "ct", "md": md, "deg": obj.degree},
                           [np.asarray(v) for v in obj.value])

    if isinstance(obj, K.SecretKey):
        return _write_blob(w, {"t": "sk", "has_p": obj.value.p is not None},
                           _qp_arrays(obj.value))

    if isinstance(obj, K.PublicKey):
        arrays = _qp_arrays(obj.value[0]) + _qp_arrays(obj.value[1])
        return _write_blob(w, {"t": "pk", "has_p": obj.value[0].p is not None},
                           arrays)

    if isinstance(obj, K.GadgetCiphertext):
        arrays = [np.asarray(obj.q)]
        if obj.p is not None:
            arrays.append(np.asarray(obj.p))
        return _write_blob(w, {"t": "gct", "has_p": obj.p is not None}, arrays)

    if isinstance(obj, K.RelinearizationKey):
        return _save_wrapped(w, "rlk", obj.gadget, {})

    if isinstance(obj, K.EvaluationKey):
        return _save_wrapped(w, "evk", obj.gadget, {})

    if isinstance(obj, K.GaloisKey):
        return _save_wrapped(w, "gk", obj.gadget, {"gal_el": obj.gal_el})

    if isinstance(obj, RGSWCiphertext):
        arrays = [np.asarray(obj.g0.q)]
        has_p = obj.g0.p is not None
        if has_p:
            arrays.append(np.asarray(obj.g0.p))
        arrays.append(np.asarray(obj.g1.q))
        if has_p:
            arrays.append(np.asarray(obj.g1.p))
        return _write_blob(w, {"t": "rgsw", "has_p": has_p}, arrays)

    raise TypeError(f"cannot serialize {type(obj).__name__}")


def _save_wrapped(w, tag, gadget, extra):
    arrays = [np.asarray(gadget.q)]
    if gadget.p is not None:
        arrays.append(np.asarray(gadget.p))
    h = {"t": tag, "has_p": gadget.p is not None}
    h.update(extra)
    return _write_blob(w, h, arrays)


def _metadata_dict(md) -> dict:
    return {"scale": _frac(md.scale), "log_dims": list(md.log_dimensions),
            "batched": md.is_batched, "ntt": md.is_ntt,
            "mont": md.is_montgomery}


def _metadata_from(d) -> "MetaData":
    from matrix_fhe_tpu.rlwe.elements import MetaData
    return MetaData(scale=_unfrac(d["scale"]),
                    log_dimensions=tuple(d["log_dims"]),
                    is_batched=d["batched"], is_ntt=d["ntt"],
                    is_montgomery=d["mont"])


def _qp_arrays(qp) -> list[np.ndarray]:
    out = [np.asarray(qp.q)]
    if qp.p is not None:
        out.append(np.asarray(qp.p))
    return out


def load(data: bytes | io.BufferedIOBase):
    """Deserialize an object written by ``save``."""
    r = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
    header, arrays = _read_blob(r)
    t = header["t"]

    from matrix_fhe_tpu.ops import samplers as smp
    from matrix_fhe_tpu.rgsw import RGSWCiphertext
    from matrix_fhe_tpu.rlwe.elements import Ciphertext, Plaintext
    from matrix_fhe_tpu.rlwe import keys as K
    from matrix_fhe_tpu.rlwe.params import Parameters

    if t == "params":
        if header["xs_kind"] == "Ternary":
            xs = smp.Ternary(p=header["xs"][0], h=header["xs"][1])
        else:
            xs = smp.DiscreteGaussian(sigma=header["xs"][0], bound=header["xs"][1])
        return Parameters(
            n=header["n"], nth_root=header["nth_root"],
            q=[int(x) for x in header["q"]], p=[int(x) for x in header["p"]],
            xe=smp.DiscreteGaussian(*header["xe"]), xs=xs,
            ring_type=header["ring_type"], ntt_flag=header["ntt_flag"],
            default_scale=header["default_scale"])

    if t == "pt":
        return Plaintext(value=jnp.asarray(arrays[0]),
                         metadata=_metadata_from(header["md"]))
    if t == "ct":
        return Ciphertext(value=tuple(jnp.asarray(a) for a in arrays),
                          metadata=_metadata_from(header["md"]))

    def qp(arr_list):
        if header["has_p"]:
            return K.QPPoly(q=jnp.asarray(arr_list[0]), p=jnp.asarray(arr_list[1]))
        return K.QPPoly(q=jnp.asarray(arr_list[0]), p=None)

    if t == "sk":
        return K.SecretKey(value=qp(arrays))
    if t == "pk":
        h = 2 if header["has_p"] else 1
        return K.PublicKey(value=(qp(arrays[:h]), qp(arrays[h:])))
    if t == "gct":
        return _gct(header, arrays)
    if t == "rlk":
        return K.RelinearizationKey(gadget=_gct(header, arrays))
    if t == "evk":
        return K.EvaluationKey(gadget=_gct(header, arrays))
    if t == "gk":
        return K.GaloisKey(gadget=_gct(header, arrays), gal_el=header["gal_el"])
    if t == "rgsw":
        h = 2 if header["has_p"] else 1
        return RGSWCiphertext(g0=_gct(header, arrays[:h]),
                              g1=_gct(header, arrays[h:]))
    raise ValueError(f"unknown type tag {t!r}")


def _gct(header, arrays):
    from matrix_fhe_tpu.rlwe import keys as K
    return K.GadgetCiphertext(
        q=jnp.asarray(arrays[0]),
        p=jnp.asarray(arrays[1]) if header["has_p"] else None)
