"""Extract a per-epoch eval-metric markdown table from a train log."""
import re
import sys

log = open(sys.argv[1]).read()
# Anchored parse: each epoch header is matched together with the FIRST eval
# line that follows it (non-greedy, stopping at the next epoch header), so a
# log with an aborted/eval-skipped epoch drops that row instead of silently
# shifting every subsequent row to the wrong epoch number.
rows = re.findall(
    r"EPOCH: (\d+) \](?:(?!EPOCH: \d+ \]).)*?"
    r"eval_color_lab_loss: ([\d.nan]+); eval_psnr: ([\d.nan]+); "
    r"eval_scc: ([\d.nan]+); eval_ssim: ([\d.nan]+); "
    r"eval_mae_loss: [\d.nan]+; eval_uiq: ([\d.nan]+);",
    log,
    flags=re.S,
)
print("| epoch | eval loss | PSNR | SSIM | SCC | UIQ |")
print("|---|---|---|---|---|---|")
for ep, loss, psnr, scc, ssim, uiq in rows:
    print(f"| {ep} | {loss} | {psnr} | {ssim} | {scc} | {uiq} |")
