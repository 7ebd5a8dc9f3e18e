# CLI entry points replacing the reference's per-script mains:
#   python -m cli.train      ~ /root/reference/train.py (mode='train')
#   python -m cli.evaluate   ~ /root/reference/train.py (mode='test', 'mpii')
#   python -m cli.compare    ~ /root/reference/performance_compare.py
#   python -m cli.params     ~ /root/reference/calculate_parameters.py
#   python -m cli.benchmark  ~ /root/reference/hourglass_compare.py:1263-1273
#   python -m cli.export     — AOT serving artifact (no reference analogue)
