* QP:  min 0.5*(2 x1^2 + 2 x2^2 + 2 x1 x2) - 6 x1 - 6 x2
*      s.t. x1 + x2 <= 2;  x1, x2 >= 0
* unconstrained optimum x = (2, 2); constrained: x1 + x2 = 2 active,
* symmetric -> x = (1, 1), f = 0.5*(2+2+2) - 12 = -9
NAME          SIMPLEQP
ROWS
 N  OBJ
 L  C1
COLUMNS
    X1        OBJ       -6.0       C1        1.0
    X2        OBJ       -6.0       C1        1.0
RHS
    RHS       C1        2.0
QUADOBJ
    X1        X1        2.0
    X1        X2        1.0
    X2        X2        2.0
ENDATA
