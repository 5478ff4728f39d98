"""MQ arithmetic coder (ITU-T T.88 Annex E ≡ T.800 Annex C) — the
adaptive binary coder shared by JBIG2 and JPEG 2000.

Both directions are implemented from the published software-convention
flowcharts: ENCODE (CODEMPS/CODELPS, RENORME, BYTEOUT with 0xFF bit
stuffing and carry propagation) and DECODE (MPS/LPS exchange, RENORMD,
BYTEIN with marker handling), over the canonical 47-row probability
state table (Qe / NMPS / NLPS / SWITCH — T.88 Table E.1, identical in
T.800 Table C.2).

Verification posture: no external MQ implementation or conformance
stream exists in this environment, so the gate is (a) encoder↔decoder
round-trip under heavy randomized sequences across context counts and
skews (tests/test_mq_coder.py), (b) the structural spec invariants —
after a 0xFF the next byte is ≤ 0x8F (bit stuffing), decode reads past
the end as 1-bits (marker rule) so truncated-terminator streams decode,
and (c) compression sanity (skewed sources compress near entropy).
The state table is data, transcribed once and eyeball-checkable
against the spec.  Encoder and decoder share it but implement their
flowcharts independently.

The JBIG2 generic-region layer on top lives in llm/jbig2.py; this
module is deliberately bitmap-agnostic so a future JPX (T.800) path
reuses it unchanged.
"""

from __future__ import annotations

__all__ = ["MQEncoder", "MQDecoder"]

# T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQEncoder:
    """MQ encoder over ``n_contexts`` adaptive contexts.  Feed bits
    with :meth:`encode`, finish with :meth:`flush` (returns the coded
    bytes, JPEG-2000-style termination with the optional trailing
    0xFF dropped — the decoder's marker rule supplies trailing
    1-bits)."""

    def __init__(self, n_contexts: int):
        self._i = bytearray(n_contexts)   # state index per context
        self._mps = bytearray(n_contexts)
        self._a = 0x8000
        self._c = 0
        self._ct = 12
        self._b: int | None = None        # pending byte
        self._out = bytearray()

    def encode(self, cx: int, d: int) -> None:
        i = self._i[cx]
        qe, nmps, nlps, switch = _QE[i]
        a = self._a - qe
        if d == self._mps[cx]:
            if a & 0x8000:
                self._a = a
                self._c += qe
                return
            # CODEMPS renorm path: conditional exchange (the MPS takes
            # the smaller LPS-sized sub-interval at the base, C fixed)
            if a < qe:
                self._a = qe
            else:
                self._a = a
                self._c += qe
            self._i[cx] = nmps
        else:
            # CODELPS with conditional exchange
            if a < qe:
                self._a = a
                self._c += qe
            else:
                self._a = qe
            if switch:
                self._mps[cx] ^= 1
            self._i[cx] = nlps
        # RENORME
        while True:
            self._a <<= 1
            self._c <<= 1
            self._ct -= 1
            if self._ct == 0:
                self._byteout()
            if self._a & 0x8000:
                break

    def _emit(self) -> None:
        if self._b is not None:
            self._out.append(self._b)

    def _byteout(self) -> None:
        if self._b == 0xFF:
            # bit stuffing: only 7 bits leave after an 0xFF
            self._emit()
            self._b = (self._c >> 20) & 0xFF
            self._c &= 0xFFFFF
            self._ct = 7
            return
        if self._c < 0x8000000:
            self._emit()
            self._b = (self._c >> 19) & 0xFF
            self._c &= 0x7FFFF
            self._ct = 8
            return
        # carry into the pending byte
        self._b += 1
        if self._b == 0xFF:
            self._c &= 0x7FFFFFF
            self._emit()
            self._b = (self._c >> 20) & 0xFF
            self._c &= 0xFFFFF
            self._ct = 7
        else:
            self._emit()
            self._b = (self._c >> 19) & 0xFF
            self._c &= 0x7FFFF
            self._ct = 8

    def flush(self) -> bytes:
        # SETBITS (T.800 C.2.9): fill the low bits of C so the final
        # bytes alone pin the interval
        tempc = self._c + self._a
        self._c |= 0xFFFF
        if self._c >= tempc:
            self._c -= 0x8000
        self._c <<= self._ct
        self._byteout()
        self._c <<= self._ct
        self._byteout()
        self._emit()
        # drop an optional trailing 0xFF: the decoder's BYTEIN marker
        # rule feeds 1-bits past the end
        while self._out and self._out[-1] == 0xFF:
            self._out.pop()
        return bytes(self._out)


class MQDecoder:
    """MQ decoder over ``n_contexts`` adaptive contexts; reads past
    the end of ``data`` as 1-bits per the marker rule, so terminated
    and truncated-terminator streams both decode."""

    def __init__(self, data: bytes, n_contexts: int):
        self._data = data
        self._i = bytearray(n_contexts)
        self._mps = bytearray(n_contexts)
        self._pad = False
        self._pad_ins = 0
        self._bp = 0
        self._c = self._byte(0) << 16
        self._bytein()
        self._c = (self._c << 7) & 0xFFFFFFFF
        self._ct -= 7
        self._a = 0x8000

    def _byte(self, idx: int) -> int:
        return self._data[idx] if idx < len(self._data) else 0xFF

    @property
    def exhausted(self) -> bool:
        """True once decode() has entered the marker-rule 1-bit
        padding (end of data, or a terminating 0xFF marker).  A few
        tail decisions legitimately resolve there (the encoder's
        flush leaves them in the register); WHOLE new structures
        starting there are garble — callers use this as a work
        gate."""
        return self._pad

    @property
    def pad_byteins(self) -> int:
        """How many 8-bit pad feeds decode() has consumed past the
        data/marker.  A correct stream's tail resolves in the ~30
        register bits the encoder's flush leaves — a handful of pad
        feeds; hundreds mean the caller is decoding structure from
        nothing (a mutated size field) and should refuse."""
        return self._pad_ins

    def _bytein(self) -> None:
        if self._byte(self._bp) == 0xFF:
            if self._byte(self._bp + 1) > 0x8F:
                # marker or end of data: feed 1-bits forever
                self._pad = True
                self._pad_ins += 1
                self._c += 0xFF00
                self._ct = 8
            else:
                self._bp += 1
                self._c += self._byte(self._bp) << 9
                self._ct = 7
        else:
            self._bp += 1
            self._c += self._byte(self._bp) << 8
            self._ct = 8

    def decode(self, cx: int) -> int:
        i = self._i[cx]
        qe, nmps, nlps, switch = _QE[i]
        self._a -= qe
        if (self._c >> 16) < qe:
            # LPS sub-interval selected (conditional exchange applies)
            if self._a < qe:
                d = self._mps[cx]
                self._i[cx] = nmps
            else:
                d = self._mps[cx] ^ 1
                if switch:
                    self._mps[cx] ^= 1
                self._i[cx] = nlps
            self._a = qe
        else:
            self._c -= qe << 16
            if self._a & 0x8000:
                return self._mps[cx]
            if self._a < qe:
                d = self._mps[cx] ^ 1
                if switch:
                    self._mps[cx] ^= 1
                self._i[cx] = nlps
            else:
                d = self._mps[cx]
                self._i[cx] = nmps
        # RENORMD
        while True:
            if self._ct == 0:
                self._bytein()
            self._a = (self._a << 1) & 0xFFFF
            self._c = (self._c << 1) & 0xFFFFFFFF
            self._ct -= 1
            if self._a & 0x8000:
                break
        return d
