from .banks import RingBuffer, ring_push, SampleBank, sample_bank_init, \
    sample_bank_update, sample_negatives
from .ema import ema_update
