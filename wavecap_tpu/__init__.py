"""wavecap_tpu — a TPU-native software-defined-radio framework.

A from-scratch rebuild of the capabilities of WaveCap-SDR (reference:
TobiasWooldridge/WaveCap-SDR) designed for TPU hardware:

- All signal processing operates on **batched time-blocks** of IQ samples
  (complex64), not small streaming chunks.  Every op is a pure function
  ``(x, state) -> (y, state)`` whose state (filter tails, oscillator phase,
  IIR carries, AGC envelope) is an explicit JAX pytree, so the whole
  pipeline jits, vmaps over channels, and shards over a device mesh.
- Hot kernels (polyphase channelizer, FIR decimation, FFT spectrum) are
  XLA/Pallas kernels sized for the MXU/VPU; narrowband demodulators are
  vmapped over a channel axis.
- Streaming continuity across blocks (the reference's ``zi``/phase-index
  bookkeeping, e.g. reference ``dsp/filters.py:558``,
  ``trunking/system.py:1434``) is handled with overlap-save carries and an
  integer-NCO phase accumulator; across time-sharded chips the carries are
  exchanged with ``ppermute`` halo exchange (see ``wavecap_tpu.parallel``).
- Bit-level protocol decode (P25 frames, FEC, TSBK, trunking control plane)
  runs on the host at symbol rate, fed by device-produced soft symbols.

Layout:
    ops/       kernel library (NCO, FIR, IIR, AGC, resample, channelizer, FFT)
    models/    demodulator pipelines (WBFM/NBFM/AM/SAM/SSB, P25 C4FM/CQPSK)
    parallel/  mesh/sharding utilities and halo exchange
    decoders/  host-side bit/frame decode (FEC, P25 frames, TSBK, pagers)
    trunking/  P25 trunking control plane (state machine, recorders)
    devices/   IQ sources (fake, file replay, SoapySDR gate)
    server/    asyncio HTTP/WebSocket API surface
    utils/     config, WAV IO, packing, validation
"""

__version__ = "0.1.0"
