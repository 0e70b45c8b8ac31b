from sesa_tpu.ops.fft import rdft, irdft
from sesa_tpu.ops.prec import net_precision
from sesa_tpu.ops.stft import stft, istft, stft_ri, istft_ri, hann_window
from sesa_tpu.ops.windows import fade_window
