* Min-cost network flow: 40 nodes, ~150 arcs.
NAME          FLOW150
ROWS
 N  FLOWCOST
 E  NODE1
 E  NODE2
 E  NODE3
 E  NODE4
 E  NODE5
 E  NODE6
 E  NODE7
 E  NODE8
 E  NODE9
 E  NODE10
 E  NODE11
 E  NODE12
 E  NODE13
 E  NODE14
 E  NODE15
 E  NODE16
 E  NODE17
 E  NODE18
 E  NODE19
 E  NODE20
 E  NODE21
 E  NODE22
 E  NODE23
 E  NODE24
 E  NODE25
 E  NODE26
 E  NODE27
 E  NODE28
 E  NODE29
 E  NODE30
 E  NODE31
 E  NODE32
 E  NODE33
 E  NODE34
 E  NODE35
 E  NODE36
 E  NODE37
 E  NODE38
 E  NODE39
 E  NODE40
COLUMNS
    F1D10     FLOWCOST  2              NODE1     1
    F1D10     NODE10    -1
    F1D15     FLOWCOST  18             NODE1     1
    F1D15     NODE15    -1
    F1D31     FLOWCOST  7              NODE1     1
    F1D31     NODE31    -1
    F1D37     FLOWCOST  15             NODE1     1
    F1D37     NODE37    -1
    F2D4      FLOWCOST  15             NODE2     1
    F2D4      NODE4     -1
    F2D22     FLOWCOST  2              NODE2     1
    F2D22     NODE22    -1
    F2D32     FLOWCOST  7              NODE2     1
    F2D32     NODE32    -1
    F3D7      FLOWCOST  12             NODE3     1
    F3D7      NODE7     -1
    F3D19     FLOWCOST  6              NODE3     1
    F3D19     NODE19    -1
    F3D30     FLOWCOST  19             NODE3     1
    F3D30     NODE30    -1
    F3D34     FLOWCOST  4              NODE3     1
    F3D34     NODE34    -1
    F4D3      FLOWCOST  14             NODE4     1
    F4D3      NODE3     -1
    F4D7      FLOWCOST  1              NODE4     1
    F4D7      NODE7     -1
    F4D9      FLOWCOST  2              NODE4     1
    F4D9      NODE9     -1
    F4D16     FLOWCOST  11             NODE4     1
    F4D16     NODE16    -1
    F5D3      FLOWCOST  12             NODE5     1
    F5D3      NODE3     -1
    F5D16     FLOWCOST  2              NODE5     1
    F5D16     NODE16    -1
    F5D28     FLOWCOST  3              NODE5     1
    F5D28     NODE28    -1
    F6D2      FLOWCOST  9              NODE6     1
    F6D2      NODE2     -1
    F6D4      FLOWCOST  9              NODE6     1
    F6D4      NODE4     -1
    F6D5      FLOWCOST  14             NODE6     1
    F6D5      NODE5     -1
    F6D14     FLOWCOST  14             NODE6     1
    F6D14     NODE14    -1
    F6D19     FLOWCOST  8              NODE6     1
    F6D19     NODE19    -1
    F6D36     FLOWCOST  1              NODE6     1
    F6D36     NODE36    -1
    F6D37     FLOWCOST  12             NODE6     1
    F6D37     NODE37    -1
    F7D1      FLOWCOST  15             NODE7     1
    F7D1      NODE1     -1
    F7D21     FLOWCOST  19             NODE7     1
    F7D21     NODE21    -1
    F7D23     FLOWCOST  15             NODE7     1
    F7D23     NODE23    -1
    F7D25     FLOWCOST  4              NODE7     1
    F7D25     NODE25    -1
    F7D35     FLOWCOST  4              NODE7     1
    F7D35     NODE35    -1
    F7D36     FLOWCOST  13             NODE7     1
    F7D36     NODE36    -1
    F8D3      FLOWCOST  8              NODE8     1
    F8D3      NODE3     -1
    F8D40     FLOWCOST  13             NODE8     1
    F8D40     NODE40    -1
    F9D13     FLOWCOST  6              NODE9     1
    F9D13     NODE13    -1
    F9D21     FLOWCOST  10             NODE9     1
    F9D21     NODE21    -1
    F9D25     FLOWCOST  1              NODE9     1
    F9D25     NODE25    -1
    F10D2     FLOWCOST  7              NODE10    1
    F10D2     NODE2     -1
    F10D28    FLOWCOST  18             NODE10    1
    F10D28    NODE28    -1
    F10D31    FLOWCOST  4              NODE10    1
    F10D31    NODE31    -1
    F11D1     FLOWCOST  9              NODE11    1
    F11D1     NODE1     -1
    F11D18    FLOWCOST  8              NODE11    1
    F11D18    NODE18    -1
    F12D14    FLOWCOST  1              NODE12    1
    F12D14    NODE14    -1
    F12D17    FLOWCOST  11             NODE12    1
    F12D17    NODE17    -1
    F12D18    FLOWCOST  1              NODE12    1
    F12D18    NODE18    -1
    F12D34    FLOWCOST  19             NODE12    1
    F12D34    NODE34    -1
    F13D7     FLOWCOST  7              NODE13    1
    F13D7     NODE7     -1
    F13D10    FLOWCOST  6              NODE13    1
    F13D10    NODE10    -1
    F13D16    FLOWCOST  12             NODE13    1
    F13D16    NODE16    -1
    F13D23    FLOWCOST  17             NODE13    1
    F13D23    NODE23    -1
    F13D35    FLOWCOST  17             NODE13    1
    F13D35    NODE35    -1
    F14D4     FLOWCOST  15             NODE14    1
    F14D4     NODE4     -1
    F14D8     FLOWCOST  13             NODE14    1
    F14D8     NODE8     -1
    F14D15    FLOWCOST  7              NODE14    1
    F14D15    NODE15    -1
    F15D35    FLOWCOST  19             NODE15    1
    F15D35    NODE35    -1
    F16D8     FLOWCOST  11             NODE16    1
    F16D8     NODE8     -1
    F16D15    FLOWCOST  15             NODE16    1
    F16D15    NODE15    -1
    F16D17    FLOWCOST  1              NODE16    1
    F16D17    NODE17    -1
    F16D39    FLOWCOST  5              NODE16    1
    F16D39    NODE39    -1
    F17D38    FLOWCOST  19             NODE17    1
    F17D38    NODE38    -1
    F18D1     FLOWCOST  17             NODE18    1
    F18D1     NODE1     -1
    F18D17    FLOWCOST  10             NODE18    1
    F18D17    NODE17    -1
    F18D30    FLOWCOST  4              NODE18    1
    F18D30    NODE30    -1
    F18D39    FLOWCOST  3              NODE18    1
    F18D39    NODE39    -1
    F18D40    FLOWCOST  19             NODE18    1
    F18D40    NODE40    -1
    F19D6     FLOWCOST  16             NODE19    1
    F19D6     NODE6     -1
    F19D24    FLOWCOST  3              NODE19    1
    F19D24    NODE24    -1
    F19D33    FLOWCOST  17             NODE19    1
    F19D33    NODE33    -1
    F19D37    FLOWCOST  12             NODE19    1
    F19D37    NODE37    -1
    F20D13    FLOWCOST  14             NODE20    1
    F20D13    NODE13    -1
    F20D14    FLOWCOST  15             NODE20    1
    F20D14    NODE14    -1
    F20D32    FLOWCOST  19             NODE20    1
    F20D32    NODE32    -1
    F20D34    FLOWCOST  1              NODE20    1
    F20D34    NODE34    -1
    F20D40    FLOWCOST  6              NODE20    1
    F20D40    NODE40    -1
    F21D10    FLOWCOST  10             NODE21    1
    F21D10    NODE10    -1
    F21D15    FLOWCOST  11             NODE21    1
    F21D15    NODE15    -1
    F21D26    FLOWCOST  18             NODE21    1
    F21D26    NODE26    -1
    F22D1     FLOWCOST  9              NODE22    1
    F22D1     NODE1     -1
    F22D36    FLOWCOST  3              NODE22    1
    F22D36    NODE36    -1
    F23D2     FLOWCOST  13             NODE23    1
    F23D2     NODE2     -1
    F23D3     FLOWCOST  14             NODE23    1
    F23D3     NODE3     -1
    F23D30    FLOWCOST  6              NODE23    1
    F23D30    NODE30    -1
    F24D14    FLOWCOST  10             NODE24    1
    F24D14    NODE14    -1
    F24D20    FLOWCOST  13             NODE24    1
    F24D20    NODE20    -1
    F24D22    FLOWCOST  2              NODE24    1
    F24D22    NODE22    -1
    F24D25    FLOWCOST  9              NODE24    1
    F24D25    NODE25    -1
    F24D33    FLOWCOST  7              NODE24    1
    F24D33    NODE33    -1
    F25D7     FLOWCOST  8              NODE25    1
    F25D7     NODE7     -1
    F25D16    FLOWCOST  3              NODE25    1
    F25D16    NODE16    -1
    F26D2     FLOWCOST  14             NODE26    1
    F26D2     NODE2     -1
    F26D12    FLOWCOST  5              NODE26    1
    F26D12    NODE12    -1
    F26D38    FLOWCOST  6              NODE26    1
    F26D38    NODE38    -1
    F27D6     FLOWCOST  10             NODE27    1
    F27D6     NODE6     -1
    F27D25    FLOWCOST  7              NODE27    1
    F27D25    NODE25    -1
    F27D31    FLOWCOST  17             NODE27    1
    F27D31    NODE31    -1
    F27D33    FLOWCOST  19             NODE27    1
    F27D33    NODE33    -1
    F27D40    FLOWCOST  8              NODE27    1
    F27D40    NODE40    -1
    F28D4     FLOWCOST  8              NODE28    1
    F28D4     NODE4     -1
    F28D11    FLOWCOST  2              NODE28    1
    F28D11    NODE11    -1
    F28D32    FLOWCOST  7              NODE28    1
    F28D32    NODE32    -1
    F28D33    FLOWCOST  2              NODE28    1
    F28D33    NODE33    -1
    F28D37    FLOWCOST  19             NODE28    1
    F28D37    NODE37    -1
    F29D5     FLOWCOST  1              NODE29    1
    F29D5     NODE5     -1
    F29D14    FLOWCOST  18             NODE29    1
    F29D14    NODE14    -1
    F29D31    FLOWCOST  15             NODE29    1
    F29D31    NODE31    -1
    F29D35    FLOWCOST  18             NODE29    1
    F29D35    NODE35    -1
    F29D37    FLOWCOST  15             NODE29    1
    F29D37    NODE37    -1
    F30D2     FLOWCOST  2              NODE30    1
    F30D2     NODE2     -1
    F30D3     FLOWCOST  2              NODE30    1
    F30D3     NODE3     -1
    F30D5     FLOWCOST  16             NODE30    1
    F30D5     NODE5     -1
    F30D18    FLOWCOST  18             NODE30    1
    F30D18    NODE18    -1
    F30D25    FLOWCOST  4              NODE30    1
    F30D25    NODE25    -1
    F30D39    FLOWCOST  7              NODE30    1
    F30D39    NODE39    -1
    F31D1     FLOWCOST  13             NODE31    1
    F31D1     NODE1     -1
    F31D11    FLOWCOST  12             NODE31    1
    F31D11    NODE11    -1
    F31D15    FLOWCOST  17             NODE31    1
    F31D15    NODE15    -1
    F31D18    FLOWCOST  9              NODE31    1
    F31D18    NODE18    -1
    F31D34    FLOWCOST  15             NODE31    1
    F31D34    NODE34    -1
    F32D4     FLOWCOST  8              NODE32    1
    F32D4     NODE4     -1
    F32D11    FLOWCOST  2              NODE32    1
    F32D11    NODE11    -1
    F32D29    FLOWCOST  8              NODE32    1
    F32D29    NODE29    -1
    F32D37    FLOWCOST  12             NODE32    1
    F32D37    NODE37    -1
    F33D6     FLOWCOST  17             NODE33    1
    F33D6     NODE6     -1
    F33D9     FLOWCOST  4              NODE33    1
    F33D9     NODE9     -1
    F33D13    FLOWCOST  3              NODE33    1
    F33D13    NODE13    -1
    F33D36    FLOWCOST  16             NODE33    1
    F33D36    NODE36    -1
    F34D2     FLOWCOST  11             NODE34    1
    F34D2     NODE2     -1
    F34D13    FLOWCOST  5              NODE34    1
    F34D13    NODE13    -1
    F34D23    FLOWCOST  10             NODE34    1
    F34D23    NODE23    -1
    F34D27    FLOWCOST  4              NODE34    1
    F34D27    NODE27    -1
    F34D36    FLOWCOST  19             NODE34    1
    F34D36    NODE36    -1
    F35D12    FLOWCOST  7              NODE35    1
    F35D12    NODE12    -1
    F35D21    FLOWCOST  4              NODE35    1
    F35D21    NODE21    -1
    F35D36    FLOWCOST  11             NODE35    1
    F35D36    NODE36    -1
    F36D4     FLOWCOST  8              NODE36    1
    F36D4     NODE4     -1
    F36D24    FLOWCOST  18             NODE36    1
    F36D24    NODE24    -1
    F37D23    FLOWCOST  10             NODE37    1
    F37D23    NODE23    -1
    F37D29    FLOWCOST  4              NODE37    1
    F37D29    NODE29    -1
    F37D38    FLOWCOST  2              NODE37    1
    F37D38    NODE38    -1
    F38D7     FLOWCOST  16             NODE38    1
    F38D7     NODE7     -1
    F38D18    FLOWCOST  18             NODE38    1
    F38D18    NODE18    -1
    F38D24    FLOWCOST  8              NODE38    1
    F38D24    NODE24    -1
    F39D15    FLOWCOST  19             NODE39    1
    F39D15    NODE15    -1
    F39D16    FLOWCOST  19             NODE39    1
    F39D16    NODE16    -1
    F39D27    FLOWCOST  2              NODE39    1
    F39D27    NODE27    -1
    F39D31    FLOWCOST  13             NODE39    1
    F39D31    NODE31    -1
    F40D10    FLOWCOST  6              NODE40    1
    F40D10    NODE10    -1
    F40D12    FLOWCOST  5              NODE40    1
    F40D12    NODE12    -1
    F40D20    FLOWCOST  11             NODE40    1
    F40D20    NODE20    -1
    F40D23    FLOWCOST  10             NODE40    1
    F40D23    NODE23    -1
    F40D38    FLOWCOST  6              NODE40    1
    F40D38    NODE38    -1
RHS
    RHS       NODE1     -16            NODE2     31
    RHS       NODE3     -13            NODE4     -31
    RHS       NODE5     16             NODE6     -32
    RHS       NODE7     -24            NODE8     -30
    RHS       NODE9     -22            NODE10    22
    RHS       NODE11    -31            NODE15    13
    RHS       NODE24    32             NODE36    30
    RHS       NODE39    24             NODE40    31
BOUNDS
 UP BND       F1D10     400            
 UP BND       F1D15     71             
 UP BND       F1D31     85             
 UP BND       F1D37     78             
 UP BND       F2D4      44             
 UP BND       F2D22     400            
 UP BND       F2D32     52             
 UP BND       F3D7      48             
 UP BND       F3D19     400            
 UP BND       F3D30     46             
 UP BND       F3D34     21             
 UP BND       F4D3      71             
 UP BND       F4D7      32             
 UP BND       F4D9      400            
 UP BND       F4D16     27             
 UP BND       F5D3      47             
 UP BND       F5D16     69             
 UP BND       F5D28     400            
 UP BND       F6D2      47             
 UP BND       F6D4      47             
 UP BND       F6D5      59             
 UP BND       F6D14     68             
 UP BND       F6D19     40             
 UP BND       F6D36     400            
 UP BND       F6D37     26             
 UP BND       F7D1      88             
 UP BND       F7D21     400            
 UP BND       F7D23     37             
 UP BND       F7D25     43             
 UP BND       F7D35     40             
 UP BND       F7D36     81             
 UP BND       F8D3      400            
 UP BND       F8D40     41             
 UP BND       F9D13     400            
 UP BND       F9D21     22             
 UP BND       F9D25     87             
 UP BND       F10D2     67             
 UP BND       F10D28    79             
 UP BND       F10D31    400            
 UP BND       F11D1     49             
 UP BND       F11D18    400            
 UP BND       F12D14    400            
 UP BND       F12D17    26             
 UP BND       F12D18    40             
 UP BND       F12D34    60             
 UP BND       F13D7     400            
 UP BND       F13D10    32             
 UP BND       F13D16    86             
 UP BND       F13D23    39             
 UP BND       F13D35    76             
 UP BND       F14D4     24             
 UP BND       F14D8     400            
 UP BND       F14D15    23             
 UP BND       F15D35    400            
 UP BND       F16D8     75             
 UP BND       F16D15    71             
 UP BND       F16D17    400            
 UP BND       F16D39    30             
 UP BND       F17D38    400            
 UP BND       F18D1     74             
 UP BND       F18D17    79             
 UP BND       F18D30    83             
 UP BND       F18D39    400            
 UP BND       F18D40    21             
 UP BND       F19D6     60             
 UP BND       F19D24    37             
 UP BND       F19D33    50             
 UP BND       F19D37    400            
 UP BND       F20D13    20             
 UP BND       F20D14    32             
 UP BND       F20D32    69             
 UP BND       F20D34    400            
 UP BND       F20D40    61             
 UP BND       F21D10    41             
 UP BND       F21D15    39             
 UP BND       F21D26    400            
 UP BND       F22D1     400            
 UP BND       F22D36    35             
 UP BND       F23D2     40             
 UP BND       F23D3     49             
 UP BND       F23D30    400            
 UP BND       F24D14    57             
 UP BND       F24D20    72             
 UP BND       F24D22    25             
 UP BND       F24D25    27             
 UP BND       F24D33    400            
 UP BND       F25D7     54             
 UP BND       F25D16    400            
 UP BND       F26D2     400            
 UP BND       F26D12    74             
 UP BND       F26D38    37             
 UP BND       F27D6     21             
 UP BND       F27D25    52             
 UP BND       F27D31    22             
 UP BND       F27D33    33             
 UP BND       F27D40    400            
 UP BND       F28D4     72             
 UP BND       F28D11    72             
 UP BND       F28D32    400            
 UP BND       F28D33    35             
 UP BND       F28D37    80             
 UP BND       F29D5     400            
 UP BND       F29D14    75             
 UP BND       F29D31    68             
 UP BND       F29D35    63             
 UP BND       F29D37    82             
 UP BND       F30D2     22             
 UP BND       F30D3     81             
 UP BND       F30D5     63             
 UP BND       F30D18    61             
 UP BND       F30D25    400            
 UP BND       F30D39    53             
 UP BND       F31D1     72             
 UP BND       F31D11    77             
 UP BND       F31D15    400            
 UP BND       F31D18    29             
 UP BND       F31D34    32             
 UP BND       F32D4     58             
 UP BND       F32D11    400            
 UP BND       F32D29    41             
 UP BND       F32D37    87             
 UP BND       F33D6     400            
 UP BND       F33D9     61             
 UP BND       F33D13    72             
 UP BND       F33D36    87             
 UP BND       F34D2     87             
 UP BND       F34D13    85             
 UP BND       F34D23    400            
 UP BND       F34D27    41             
 UP BND       F34D36    42             
 UP BND       F35D12    400            
 UP BND       F35D21    30             
 UP BND       F35D36    60             
 UP BND       F36D4     400            
 UP BND       F36D24    24             
 UP BND       F37D23    67             
 UP BND       F37D29    400            
 UP BND       F37D38    21             
 UP BND       F38D7     68             
 UP BND       F38D18    61             
 UP BND       F38D24    400            
 UP BND       F39D15    52             
 UP BND       F39D16    69             
 UP BND       F39D27    400            
 UP BND       F39D31    45             
 UP BND       F40D10    32             
 UP BND       F40D12    72             
 UP BND       F40D20    400            
 UP BND       F40D23    86             
 UP BND       F40D38    49             
ENDATA
