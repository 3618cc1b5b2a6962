__version__ = "0.1.0"

# Version of the reference implementation whose behaviour this framework
# reproduces (koszullab/chromosight, see /root/reference setup.py:26-29).
REFERENCE_VERSION = "1.6.3"
