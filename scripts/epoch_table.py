"""Extract a per-epoch eval-metric markdown table from a train log."""
import re
import sys

log = open(sys.argv[1]).read()
epochs = re.findall(r"EPOCH: (\d+) \]", log)
evals = re.findall(
    r"eval_color_lab_loss: ([\d.nan]+); eval_psnr: ([\d.nan]+); eval_scc: ([\d.nan]+); "
    r"eval_ssim: ([\d.nan]+); eval_mae_loss: [\d.nan]+; eval_uiq: ([\d.nan]+);",
    log,
)
print("| epoch | eval loss | PSNR | SSIM | SCC | UIQ |")
print("|---|---|---|---|---|---|")
for ep, (loss, psnr, scc, ssim, uiq) in zip(epochs, evals):
    print(f"| {ep} | {loss} | {psnr} | {ssim} | {scc} | {uiq} |")
